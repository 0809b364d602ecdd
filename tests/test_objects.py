"""DbObject parse + stringify tests (mirrors reference tests/test_db_object.py)."""

import pytest

from sayn_spark.core.objects import DbObjectCompiler


def mk(**kw):
    return DbObjectCompiler(default_db="spark", **kw)


def test_parse_components():
    c = mk()
    o = c.from_string("tbl")
    assert (o.database, o.schema, o.table) == (None, None, "tbl")
    o = c.from_string("sch.tbl")
    assert (o.database, o.schema, o.table) == (None, "sch", "tbl")
    o = c.from_string("db.sch.tbl")
    assert (o.database, o.schema, o.table) == ("db", "sch", "tbl")


def test_parse_connection_prefix():
    o = mk().from_string("other:sch.tbl")
    assert o.connection_name == "other"
    assert o.raw == "sch.tbl"


def test_trailing_dot_levels():
    c = mk()
    o = c.from_string("sch.")  # schema-level reference
    assert (o.database, o.schema, o.table) == (None, "sch", None)
    o = c.from_string("db..")  # database-level reference
    assert (o.database, o.schema, o.table) == ("db", None, None)


def test_level_argument():
    c = mk()
    o = c.from_string("sch", level="schema")
    assert (o.schema, o.table) == ("sch", None)
    with pytest.raises(ValueError):
        c.from_string("a.b.c", level="schema")  # overflow


def test_stringify_prefix_suffix():
    c = mk(stringify={"table_prefix": "dev", "schema_suffix": "tmp"})
    assert c.out_value(c.from_string("sch.tbl")) == "sch_tmp.dev_tbl"


def test_stringify_override():
    c = mk(stringify={"table_override": "u_{table}_x"})
    assert c.out_value(c.from_string("tbl")) == "u_tbl_x"


def test_from_prod_reads_prod_name_for_src_only():
    c = mk(
        stringify={"table_prefix": "dev"},
        prod_stringify={},
        from_prod=["base_.*"],
    )
    o = c.from_string("base_events")
    assert c.src_value(o) == "base_events"  # prod (unprefixed) name when reading
    assert c.out_value(o) == "dev_base_events"  # writes never go to prod
    o2 = c.from_string("other_tbl")
    assert c.src_value(o2) == "dev_other_tbl"


def test_identity_and_key():
    c = mk()
    assert c.from_string("a.b") == c.from_string("a.b")
    assert c.from_string("a.b") != c.from_string("x:a.b")
