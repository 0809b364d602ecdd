from sayn_spark.operators.ann import AnnIndexTask  # noqa: F401
from sayn_spark.operators.ann_search import AnnSearchTask  # noqa: F401
from sayn_spark.operators.base import RunArguments, Task, TaskContext, TaskStatus  # noqa: F401
from sayn_spark.operators.chunk import ChunkTask  # noqa: F401
from sayn_spark.operators.copy import CopyTask  # noqa: F401
from sayn_spark.operators.decontaminate import DecontaminateTask  # noqa: F401
from sayn_spark.operators.dedup import DedupTask  # noqa: F401
from sayn_spark.operators.embed import EmbedTask  # noqa: F401
from sayn_spark.operators.filter import FilterTask  # noqa: F401
from sayn_spark.operators.mixture import MixtureTask  # noqa: F401
from sayn_spark.operators.pack import PackTask  # noqa: F401
from sayn_spark.operators.sample import SampleTask  # noqa: F401
from sayn_spark.operators.shuffle import ShuffleTask  # noqa: F401
from sayn_spark.operators.python import (  # noqa: F401
    ClassPythonTask,
    DecoratedPythonTask,
    DummyTask,
    ModulePythonTask,
    PythonTask,
    task,
)
from sayn_spark.operators.sql import AutoSqlTask, SqlTask  # noqa: F401
from sayn_spark.operators.test import TestTask  # noqa: F401

# task-type registry (ref: core/app.py:34-40)
TASK_TYPES = {
    "dummy": DummyTask,
    "sql": SqlTask,
    "autosql": AutoSqlTask,
    "copy": CopyTask,
    "dedup": DedupTask,
    "ann_index": AnnIndexTask,
    "ann_search": AnnSearchTask,
    "embed": EmbedTask,
    "filter": FilterTask,
    "decontaminate": DecontaminateTask,
    "mixture": MixtureTask,
    "pack": PackTask,
    "chunk": ChunkTask,
    "sample": SampleTask,
    "shuffle": ShuffleTask,
    "test": TestTask,
    "python": ClassPythonTask,
    "python_module": ModulePythonTask,
    "python_decorator": DecoratedPythonTask,
}
