"""Python tasks: class-based and decorator-based
(ref: tasks/python.py:15-29, 91-114, 231-246).

Class form: subclass PythonTask, override config/setup/run/compile/test.
Decorator form::

    @task(outputs=["logs_table"], parents=["other"], tags=["etl"])
    def my_task(context, spark, warehouse, my_param):
        ...

Function parameters are injected **by name** (ref: python.py:91-114):
``context`` -> the task object, ``spark`` -> SparkSession, a connection
name -> that connection, anything else -> task parameter value.
"""

from __future__ import annotations

import importlib
import inspect
from typing import Any, Callable, Optional

from sayn_spark.operators.base import Task, TaskStatus


class PythonTask(Task):
    """User-facing base class (ref: tasks/python.py:15-29).

    Convenience API mirrors the reference PythonTask: self.spark,
    self.default_db (SparkDatabase with load_data/read_data/execute),
    self.parameters, self.src()/self.out().
    """

    @property
    def spark(self):
        return self.context.spark

    @property
    def default_db(self):
        return self.context.db

    @property
    def parameters(self) -> dict[str, Any]:
        return {**self.context.parameters, **self.task_parameters}

    # logging convenience, delegating to the per-task event tracker
    # (ref: tasks/task.py debug/info/warning/error -> tracker)
    def debug(self, message: str, **details: Any) -> None:
        self.tracker.debug(message, **details)

    def info(self, message: str, **details: Any) -> None:
        self.tracker.info(message, **details)

    def warning(self, message: str, **details: Any) -> None:
        self.tracker.warning(message, **details)

    def error(self, message: str, **details: Any) -> None:
        self.tracker.error(message, **details)

    # step bookkeeping passthrough (ref: tasks/task.py set_run_steps)
    def set_run_steps(self, steps: list[str]) -> None:
        self.tracker.set_run_steps(steps)

    def start_step(self, step: str) -> None:
        self.tracker.start_step(step)

    def finish_current_step(self) -> None:
        self.tracker.finish_current_step()

    def config(self) -> None:
        self.status = TaskStatus.READY


# registry for decorated tasks, filled when the project's python module
# is imported (ref: utils/python_loader.py:15-37)
DECORATED_TASKS: dict[str, dict[str, Any]] = {}

# (resolved path, mtime) -> (module, captured @task registrations) —
# one loader shared by App._load_python_module and the `class:
# python.*` task form (the duplication deferred from r12), and one
# exec per file per process: a second App over the same project reuses
# the module instead of re-executing it
_PROJECT_MODULE_CACHE: dict[tuple[str, int, int], tuple[Any, dict]] = {}


def load_project_python_file(project_dir, file) -> tuple[Any, dict]:
    """Execute ONE file from a project's python/ dir under a
    project-unique module name (two projects with the same module names
    must never collide in sys.modules — ref: utils/python_loader.py:
    15-37) and return ``(module, registrations)``, where registrations
    are the @task entries the exec added.  The global DECORATED_TASKS
    registry is captured and restored around the exec, the project dir
    joins sys.path for the duration (so project modules can import
    siblings), and results are cached by resolved path + mtime_ns + size."""
    import importlib.util
    import sys
    from pathlib import Path

    file = Path(file)
    project_dir = Path(project_dir)
    st = file.stat()
    path = str(file.resolve())
    # st_mtime_ns + st_size: coarse-mtime filesystems can tick identical
    # mtimes for an edit within the same second, which served the stale
    # module and its stale @task registrations (advice r13)
    key = (path, st.st_mtime_ns, st.st_size)
    hit = _PROJECT_MODULE_CACHE.get(key)
    if hit is not None:
        return hit
    # a fresh key for this path supersedes any older entry — evict so the
    # cache doesn't grow one dead module per edit
    for stale in [k for k in _PROJECT_MODULE_CACHE if k[0] == path]:
        del _PROJECT_MODULE_CACHE[stale]
    ns = f"_sayn_proj_{abs(hash(str(project_dir.resolve())))}"
    rel = file.resolve().relative_to((project_dir / "python").resolve())
    modname = f"{ns}_{'_'.join(rel.with_suffix('').parts)}"
    prev = dict(DECORATED_TASKS)
    DECORATED_TASKS.clear()
    sys.path.insert(0, str(project_dir))
    try:
        spec = importlib.util.spec_from_file_location(modname, file)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        regs = dict(DECORATED_TASKS)
    finally:
        DECORATED_TASKS.clear()
        DECORATED_TASKS.update(prev)
        sys.path.remove(str(project_dir))
    _PROJECT_MODULE_CACHE[key] = (mod, regs)
    return mod, regs


def task(
    func: Optional[Callable] = None,
    *,
    name: Optional[str] = None,
    sources: Optional[list[str]] = None,
    outputs: Optional[list[str]] = None,
    parents: Optional[list[str]] = None,
    tags: Optional[list[str]] = None,
    on_fail: Optional[str] = None,
) -> Callable:
    """@task decorator (ref: tasks/python.py:231-246)."""

    def wrap(f: Callable) -> Callable:
        DECORATED_TASKS[name or f.__name__] = {
            "func": f,
            "sources": sources or [],
            "outputs": outputs or [],
            "parents": parents or [],
            "tags": tags or [],
            "on_fail": on_fail,
        }
        return f

    return wrap(func) if func is not None else wrap


class DecoratedPythonTask(PythonTask):
    """Adapter running a @task-decorated function."""

    def config(self) -> None:
        spec = self.config_dict.get("_decorated") or DECORATED_TASKS[self.name]
        self.func = spec["func"]
        self.parents = list({*self.parents, *spec["parents"]})
        self.tags = list({*self.tags, *spec["tags"]})
        if spec.get("on_fail"):
            self.on_fail = spec["on_fail"]
        for s in spec["sources"]:
            self.src(s)
        for o in spec["outputs"]:
            self.out(o)
        self.status = TaskStatus.READY

    def run(self) -> None:
        kwargs: dict[str, Any] = {}
        for pname, param in inspect.signature(self.func).parameters.items():
            if param.kind in (param.VAR_POSITIONAL, param.VAR_KEYWORD):
                continue  # *args/**kwargs need no injection
            if pname == "context":
                kwargs[pname] = self
            elif pname == "tracker":
                # ref tasks exposed self.debug/info via the tracker
                # (task_event_tracker.py:78-90); decorator form injects it
                kwargs[pname] = self.tracker
            elif pname == "spark":
                kwargs[pname] = self.context.spark
            elif pname in self.context.connections:
                kwargs[pname] = self.context.connections[pname]
            elif pname == self.context.db.name or pname == "warehouse":
                kwargs[pname] = self.context.db
            elif pname in self.parameters:
                kwargs[pname] = self.parameters[pname]
            elif param.default is not param.empty:
                continue  # the function's own default applies
            else:
                raise ValueError(
                    f"python task {self.name!r}: cannot inject parameter {pname!r}"
                )
        result = self.func(**kwargs)
        if result is not None and hasattr(result, "write") and self.outputs:
            # returning a DataFrame materialises it to THE declared
            # output — with several outputs the set's iteration order
            # would pick one arbitrarily (hash-seed dependent), so
            # demand explicitness instead
            if len(self.outputs) != 1:
                raise ValueError(
                    f"python task {self.name!r}: returning a DataFrame "
                    f"requires exactly ONE declared output (got "
                    f"{len(self.outputs)}) — write each table explicitly "
                    "via context.default_db inside the task"
                )
            dst = self.context.obj_compiler.out_value(next(iter(self.outputs)))
            self.context.db.replace_table(dst, result)


class ClassPythonTask(Task):
    """`class: module.Class` form (ref: core/app.py:332-345)."""

    def _resolve_class(self) -> type:
        path = self.config_dict["class"]
        module_name, cls_name = path.rsplit(".", 1)
        if module_name.startswith("python."):
            # load from THIS project's python/ dir via the shared cached
            # loader (project-unique module name, registry capture,
            # sys.path scoping — see load_project_python_file)
            from pathlib import Path

            rel = module_name.split(".")[1:]
            file = (
                Path(self.context.project_dir) / "python" / ("/".join(rel) + ".py")
            )
            module, _ = load_project_python_file(self.context.project_dir, file)
        else:
            module = importlib.import_module(module_name)
        return getattr(module, cls_name)

    def config(self) -> None:
        cls = self._resolve_class()
        if not issubclass(cls, PythonTask):
            raise TypeError(f"{cls!r} is not a PythonTask subclass")
        self.impl = cls(self.name, self.config_dict, self.context)
        self.impl.config()
        self.parents = self.impl.parents
        self.tags = self.impl.tags
        self.sources = self.impl.sources
        self.outputs = self.impl.outputs
        self.on_fail = self.impl.on_fail
        self.status = TaskStatus.READY

    def _sync_tracker(self) -> None:
        # the App attaches the run-time tracker to the OUTER task right
        # before execution; without forwarding it, every self.info/
        # set_run_steps call inside a class-form PythonTask routed to
        # the null tracker and vanished (second-pass review r12)
        self.impl.tracker = self.tracker

    def setup(self) -> None:
        self._sync_tracker()
        self.impl.setup()

    def run(self) -> None:
        self._sync_tracker()
        self.impl.run()

    def compile(self) -> None:
        self._sync_tracker()
        self.impl.compile()

    def test(self) -> None:
        self._sync_tracker()
        self.impl.test()


class ModulePythonTask(ClassPythonTask):
    """`type: python_module` — the config carries the task class object
    itself under ``task_class`` (ref: core/app.py:333-334, the
    programmatic registration path behind the @task decorator)."""

    def _resolve_class(self) -> type:
        return self.config_dict["task_class"]


class DummyTask(Task):
    """No-op grouping node (ref: tasks/dummy.py:4-19)."""

    def config(self) -> None:
        self.status = TaskStatus.READY
