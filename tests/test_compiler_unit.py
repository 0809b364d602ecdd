"""Jinja compiler tests (parameters, run-window globals, task env, macros)."""

import datetime as dt

from sayn_spark.core.compiler import Compiler


def test_parameters_and_globals():
    c = Compiler(parameters={"schema": "an"}, start_dt=dt.date(2024, 1, 2), end_dt=dt.date(2024, 1, 3))
    out = c.compile("SELECT * FROM {{ schema }}.t WHERE d >= {{ start_dt }} AND d < {{ end_dt }}")
    assert out == "SELECT * FROM an.t WHERE d >= '2024-01-02' AND d < '2024-01-03'"


def test_full_load_conditional():
    c = Compiler(full_load=True)
    assert c.compile("{% if full_load %}all{% else %}delta{% endif %}") == "all"
    assert Compiler().compile("{% if full_load %}all{% else %}delta{% endif %}") == "delta"


def test_prod_parameters():
    c = Compiler(parameters={"schema": "dev"}, prod_parameters={"schema": "prod"})
    assert c.compile("{{ schema }}") == "dev"
    assert c.compile("{{ schema }}", use_prod_parameters=True) == "prod"


def test_task_compiler_macros():
    captured = {}

    def src(o):
        captured.setdefault("src", []).append(o)
        return f"SRC({o})"

    def out(o):
        captured.setdefault("out", []).append(o)
        return f"OUT({o})"

    def config(**kw):
        captured["config"] = kw
        return ""

    c = Compiler(parameters={"p": 1}).task_compiler(
        "my_task", group="g", src=src, out=out, config=config, task_parameters={"p": 2}
    )
    res = c.compile(
        "{{ config(materialisation='view') }}SELECT {{ p }} FROM {{ src('a.b') }} -- {{ task.name }}/{{ task.group }}"
    )
    assert res == "SELECT 2 FROM SRC(a.b) -- my_task/g"
    assert captured["src"] == ["a.b"]
    assert captured["config"] == {"materialisation": "view"}
