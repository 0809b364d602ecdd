"""CLI (ref: cli.py:12-79, 253-289): run / compile / test with
-t/-x task queries, --full-load, --start-dt/--end-dt, --profile,
--with-tests, --fail-fast.

    python -m sayn_spark.cli run -p examples/star_project -t +f_rankings
"""

from __future__ import annotations

import datetime as dt

import click

from sayn_spark.core.app import App
from sayn_spark.operators.base import DEFAULT_JOBS, RunArguments, TaskStatus


def _common(f):
    for deco in reversed(
        [
            click.option("--project-dir", "-p", default=".", help="project directory"),
            click.option("--tasks", "-t", multiple=True, help="include task query"),
            click.option("--exclude", "-x", multiple=True, help="exclude task query"),
            click.option("--profile", default=None),
            click.option("--full-load", is_flag=True, default=False),
            click.option("--start-dt", default=None),
            click.option("--end-dt", default=None),
            click.option("--fail-fast", is_flag=True, default=False),
            click.option(
                "--upstream-prod",
                is_flag=True,
                default=False,
                help="read unselected upstream sources from prod names",
            ),
            click.option(
                "--jobs",
                "-j",
                type=int,
                default=DEFAULT_JOBS,
                help="concurrent tasks per DAG level (1 = reference's sequential loop)",
            ),
        ]
    ):
        f = deco(f)
    return f


def _build_app(command, project_dir, tasks, exclude, profile, full_load, start_dt, end_dt, fail_fast, upstream_prod, with_tests=False, jobs=DEFAULT_JOBS):
    try:
        # a malformed date must be a clean CLI error like every other
        # config problem, not a raw traceback (review r12)
        parsed_start = dt.date.fromisoformat(start_dt) if start_dt else None
        parsed_end = dt.date.fromisoformat(end_dt) if end_dt else None
    except ValueError as e:
        raise click.ClickException(f"invalid --start-dt/--end-dt: {e}") from e
    # an inverted window compiles BETWEEN start AND end clauses that
    # match nothing: every incremental task would load ZERO rows and the
    # run would still report SUCCESS (hazard review r14; the reference
    # accepts it silently — failing loudly is the deliberate divergence).
    # Compare EFFECTIVE values: a missing side defaults to yesterday
    # (the compiler's rule), so `--start-dt <today>` alone is just as
    # empty as an explicit inverted pair (second-pass review r14).
    yesterday = dt.date.today() - dt.timedelta(days=1)
    eff_start = parsed_start or yesterday
    eff_end = parsed_end or yesterday
    if eff_start > eff_end:
        raise click.ClickException(
            f"--start-dt {eff_start} is after --end-dt {eff_end}"
            f"{'' if parsed_end else ' (the default, yesterday)'}: "
            "the run window is empty, so every incremental task would "
            "silently load nothing"
        )
    args = RunArguments(
        command=command,
        full_load=full_load,
        start_dt=parsed_start,
        end_dt=parsed_end,
        with_tests=with_tests,
        fail_fast=fail_fast,
        upstream_prod=upstream_prod,
        include=list(tasks),
        exclude=list(exclude),
        jobs=jobs,
    )
    try:
        return App(project_dir, profile=profile, run_arguments=args)
    except (ValueError, FileNotFoundError) as e:
        raise click.ClickException(str(e)) from e


def _run_and_finish(app, method: str) -> None:
    from sayn_spark.plans.dag import DagError
    from sayn_spark.plans.task_query import TaskQueryError

    try:
        statuses = getattr(app, method)()
    except (TaskQueryError, DagError) as e:
        raise click.ClickException(str(e)) from e
    _finish(statuses)


def _finish(statuses: dict[str, TaskStatus]) -> None:
    failed = [n for n, s in statuses.items() if s == TaskStatus.FAILED]
    click.echo(
        f"done: {sum(s == TaskStatus.SUCCESS for s in statuses.values())} ok, "
        f"{len(failed)} failed, "
        f"{sum(s == TaskStatus.SKIPPED for s in statuses.values())} skipped"
    )
    if failed:
        raise SystemExit(1)


@click.group()
def cli() -> None:
    """sayn-spark: PySpark-native analytics engine."""


@cli.command()
@_common
@click.option("--with-tests", is_flag=True, default=False)
def run(project_dir, tasks, exclude, profile, full_load, start_dt, end_dt, fail_fast, upstream_prod, jobs, with_tests):
    """Execute selected tasks."""
    app = _build_app("run", project_dir, tasks, exclude, profile, full_load, start_dt, end_dt, fail_fast, upstream_prod, with_tests, jobs)
    _run_and_finish(app, "run")


@cli.command()
@_common
def compile(project_dir, tasks, exclude, profile, full_load, start_dt, end_dt, fail_fast, upstream_prod, jobs):
    """Compile selected tasks to compile/<group>/<task>.sql."""
    app = _build_app("compile", project_dir, tasks, exclude, profile, full_load, start_dt, end_dt, fail_fast, upstream_prod, jobs=jobs)
    _run_and_finish(app, "compile")


@cli.command()
@_common
def test(project_dir, tasks, exclude, profile, full_load, start_dt, end_dt, fail_fast, upstream_prod, jobs):
    """Run data-quality tests for selected tasks."""
    app = _build_app("test", project_dir, tasks, exclude, profile, full_load, start_dt, end_dt, fail_fast, upstream_prod, jobs=jobs)
    _run_and_finish(app, "test")


@cli.command()
@_common
def dag(project_dir, tasks, exclude, profile, full_load, start_dt, end_dt, fail_fast, upstream_prod, jobs):
    """Write the task DAG as Graphviz DOT + a dependency-free layered
    SVG (+ PNG when graphviz is installed) and print the concurrent
    execution levels (ref: `sayn dag-image`, cli.py:328-341 /
    utils/graphviz.py:4-34 — same node/edge drawing, without the hard
    graphviz dependency)."""
    from pathlib import Path

    from sayn_spark.plans.dag import ready_sets

    app = _build_app("compile", project_dir, tasks, exclude, profile, full_load,
                     start_dt, end_dt, fail_fast, upstream_prod)
    # honour -t/-x like every other command: rendering the full DAG for
    # a selection query was silently misleading (review r12)
    selected = set(app.select_tasks())
    dag = {n: [p for p in ps if p in selected]
           for n, ps in app.dag.items() if n in selected}
    lines = ["digraph sayn_spark {", '  graph [splines=ortho, nodesep="0.8"];',
             "  node [style=rounded, shape=box];"]
    for name in dag:
        lines.append(f'  "{name}";')
    for name, parents in dag.items():
        for p in parents:
            lines.append(f'  "{p}" -> "{name}";')
    lines.append("}")
    out_dir = Path(project_dir) / "images"
    out_dir.mkdir(exist_ok=True)
    dot_path = out_dir / "dag.dot"
    dot_path.write_text("\n".join(lines) + "\n")
    click.echo(f"wrote {dot_path}")
    # always-available image: dependency-free layered SVG
    from sayn_spark.plans.dag_svg import dag_to_svg

    svg_path = out_dir / "dag.svg"
    svg_path.write_text(dag_to_svg(dag))
    click.echo(f"wrote {svg_path}")
    try:
        import graphviz  # type: ignore

        graphviz.Source(dot_path.read_text()).render(
            str(out_dir / "dag"), format="png", cleanup=True
        )
        click.echo(f"wrote {out_dir / 'dag.png'}")
    except ImportError:
        pass  # PNG is optional; the SVG above always renders
    for i, level in enumerate(ready_sets(dag)):
        click.echo(f"level {i}: {' '.join(sorted(level))}")


@cli.command()
@click.argument("project_name")
def init(project_name):
    """Scaffold a new runnable project (ref: sayn init,
    scaffolding/init_project.py:6-28): tutorial tasks + settings.yaml
    with a dev/prod profile example + README + .gitignore."""
    import shutil
    from pathlib import Path

    template = Path(__file__).parent / "scaffolding" / "init_project"
    dst = Path(project_name)
    if dst.exists():
        raise click.ClickException(f"{project_name!r} already exists")
    shutil.copytree(template, dst, ignore=shutil.ignore_patterns("__pycache__"))
    # the scaffold ships neutral names so the repo's own ignore rules
    # don't eat them; rename into place (ref renames sample_settings.yaml)
    (dst / "sample_settings.yaml").rename(dst / "settings.yaml")
    (dst / "gitignore").rename(dst / ".gitignore")
    click.echo(f"created {project_name}/ — run: sayn-spark run -p {project_name}")


if __name__ == "__main__":
    cli()
