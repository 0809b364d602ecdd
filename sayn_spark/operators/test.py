"""Test task: custom SQL data-quality checks
(ref: tasks/test.py:95-175).

The user query returns *violations*: empty result = pass.  The engine
appends LIMIT 5 to cap failure diagnostics (ref :95-97).
"""

from __future__ import annotations

from pathlib import Path

from sayn_spark.operators.base import Task, TaskStatus


class TestTask(Task):
    def config(self) -> None:
        c = self.config_dict
        self.file_name = c.get("file_name")
        if not self.file_name:
            raise ValueError(f"test task {self.name!r} needs file_name")
        self.file_name = self.compile_property(self.file_name)
        sql_path = self.context.project_dir / "sql" / self.file_name
        if not sql_path.exists():
            sql_path = self.context.project_dir / self.file_name
        self._raw_sql = Path(sql_path).read_text()
        self.compiled = self.task_compiler.compile(self._raw_sql)
        self.status = TaskStatus.READY

    def setup(self) -> None:
        # recompile like the sql task: src() must resolve against the
        # sources_from_prod the app computed AFTER config ran, or
        # --upstream-prod tests would read the dev names
        self.compiled = self.task_compiler.compile(self._raw_sql)

    def run(self) -> None:
        self.test()

    def test(self) -> None:
        rows = self.context.spark.sql(self.compiled).limit(5).collect()
        if rows:  # ref: tasks/test.py:149-175 — any row is a failure
            raise AssertionError(
                f"test {self.name!r} failed; offending rows (max 5): "
                + "; ".join(str(r.asDict()) for r in rows)
            )

    def compile(self) -> None:
        self.write_compilation_output(self.compiled)
