"""DbObject identity + dev/prod name rewriting ("stringify").

Mirrors the reference's `database/objects.py:10-279`: objects are
``(connection, database, schema, table)`` parsed from
``[connection:][database.][schema.]table`` with the trailing-dot
"reference level" grammar (``db..`` = database-level ref, ``schema.`` =
schema-level).  Stringify rules rewrite each component with
prefix/suffix/override patterns so dev runs target different physical
names than prod; ``from_prod`` regex globs let selected sources read
the prod objects during dev runs (`database/objects.py:124-139`).

In Spark the physical identifier is a catalog name
``[catalog.]schema.table`` used with spark.catalog / saveAsTable.
"""

from __future__ import annotations

import re
from collections import deque
from typing import Mapping, Optional, Sequence


class DbObject:
    """Hashable object identity, keyed ``connection:raw``
    (ref: database/objects.py:10-53)."""

    def __init__(
        self,
        connection_name: str,
        database: Optional[str],
        schema: Optional[str],
        table: Optional[str],
    ) -> None:
        self.connection_name = connection_name
        self.database = database
        self.schema = schema
        self.table = table

        raw = ""
        if database is not None:
            raw += database + "."
        if schema is not None:
            raw += schema + "."
        if database is not None and schema is None:
            raw += "."
        if table is not None:
            raw += table
        self.raw = raw
        self.key = f"{connection_name}:{raw}"

    def __hash__(self) -> int:
        return hash(self.key)

    def __eq__(self, other) -> bool:
        return isinstance(other, DbObject) and self.key == other.key

    def __repr__(self) -> str:
        return f"DbObject({self.key})"


_REGEX_OBJ = re.compile(
    r"^\s*((?P<connection>[^:]+):)?((?P<c1>[^.]+)\.)?((?P<c2>[^.]+)\.)?(?P<c3>[^.]+)"
    r"(?P<dots>\.{0,2})\s*$"
)

_REFERENCE_LEVEL = {None: 0, "schema": -1, "db": -2}

# The Spark session catalog (Hive metastore) only accepts [A-Za-z0-9_]
# object names — INVALID_SCHEMA_OR_RELATION_NAME even when backticked
# (verified empirically on pyspark 4).  Validating here turns a
# mid-run ParseException (AFTER upstream tasks already executed) into
# a config-time error naming the object.
_VALID_COMPONENT = re.compile(r"^[A-Za-z0-9_]+$")

STRINGIFY_KEYS = [
    f"{t}_{k}" for t in ("database", "schema", "table") for k in ("prefix", "suffix", "override")
]


def _build_stringify(type_: str, prefix, suffix, override) -> str:
    """ref: database/objects.py:98-119 — override wins; else
    ``prefix_{x}_suffix``."""
    stringify = "{" + type_ + "}"
    if override:
        stringify = override
    else:
        if prefix:
            stringify = prefix + "_" + stringify
        if suffix:
            stringify = stringify + "_" + suffix
    return stringify


class DbObjectCompiler:
    """Parses object strings and computes physical (stringified) names
    (ref: database/objects.py:57-279)."""

    def __init__(
        self,
        default_db: str = "spark",
        connections: Sequence[str] = ("spark",),
        stringify: Optional[Mapping[str, Optional[str]]] = None,
        prod_stringify: Optional[Mapping[str, Optional[str]]] = None,
        from_prod: Sequence[str] = (),
    ) -> None:
        self.default_db = default_db
        self.connections = set(connections) | {default_db}
        stringify = dict(stringify or {})
        prod_stringify = dict(prod_stringify or {})
        for k in STRINGIFY_KEYS:
            stringify.setdefault(k, None)
            prod_stringify.setdefault(k, None)
        # dev falls back to prod rules per-key (ref: objects.py:77)
        stringify = {k: v if v is not None else prod_stringify[k] for k, v in stringify.items()}
        self.stringify = {
            t: _build_stringify(
                t, stringify[f"{t}_prefix"], stringify[f"{t}_suffix"], stringify[f"{t}_override"]
            )
            for t in ("database", "schema", "table")
        }
        self.prod_stringify = {
            t: _build_stringify(
                t,
                prod_stringify[f"{t}_prefix"],
                prod_stringify[f"{t}_suffix"],
                prod_stringify[f"{t}_override"],
            )
            for t in ("database", "schema", "table")
        }
        # hazard review r14 — validate the rules at CONFIG time, not
        # deep inside a task run:
        # * a template with a typo'd placeholder ({tble}) raised a raw
        #   KeyError at format time;
        # * a table template that LOST its {table} placeholder collapses
        #   every table to one physical name — a dev run would silently
        #   overwrite the same object once per task (constant overrides
        #   stay legal for database/schema: routing all dev objects into
        #   one database is the normal use);
        # * an invalid from_prod regex was a raw re.error traceback.
        sentinel = "\x00sayn\x00"
        for rules_name, rules in (
            ("stringify", self.stringify),
            ("prod_stringify", self.prod_stringify),
        ):
            for t, tmpl in rules.items():
                try:
                    rendered = tmpl.format(**{t: sentinel})
                except (KeyError, IndexError, ValueError) as e:
                    raise ValueError(
                        f"invalid {rules_name} rule for {t}: {tmpl!r} — only "
                        f"{{{t}}} may appear in it ({e})"
                    ) from e
                if t == "table" and sentinel not in rendered:
                    raise ValueError(
                        f"invalid {rules_name} rule for table: {tmpl!r} does "
                        "not contain {table}, so EVERY table would map to "
                        "the same physical name"
                    )
                # the RENDERED name must satisfy the catalog grammar too —
                # a prefix like "dev-" would break every task mid-run
                if not _VALID_COMPONENT.match(tmpl.format(**{t: "x"})):
                    raise ValueError(
                        f"invalid {rules_name} rule for {t}: {tmpl!r} "
                        "produces names outside the Spark catalog grammar "
                        "(letters, digits and _ only)"
                    )
        try:
            self.from_prod = [re.compile(p) for p in from_prod]
        except re.error as e:
            raise ValueError(f"invalid from_prod pattern: {e}") from e
        self.sources_from_prod: set[DbObject] = set()

    # -- parsing -------------------------------------------------------

    def from_string(
        self, obj: str, connection: Optional[str] = None, level: Optional[str] = None
    ) -> DbObject:
        """Parse ``[conn:][db.][schema.]table[.|..]``
        (ref: database/objects.py:190-279 incl. trailing-dot levels)."""
        match = _REGEX_OBJ.match(obj)
        if match is None:
            raise ValueError(f"incorrect format for database object {obj!r}")
        if level not in _REFERENCE_LEVEL:
            raise ValueError(f"incorrect reference level {level!r}")
        groups = match.groupdict()

        if groups["connection"] is None:
            connection_name = connection or self.default_db
        else:
            if connection is not None and groups["connection"] != connection:
                raise ValueError("connection name mismatch")
            connection_name = groups["connection"]

        if groups["c1"] is not None and groups["c2"] is None:
            groups["c2"] = groups["c1"]
            groups["c1"] = None

        period_count = groups["dots"].count(".")
        if _REFERENCE_LEVEL[level] == 0:
            if period_count > 2:
                raise ValueError(f"invalid trailing periods in {obj!r}")
            provided_level = -1 * period_count
        else:
            provided_level = _REFERENCE_LEVEL[level]
            if period_count > -1 * provided_level:
                raise ValueError(f"level {level!r} and trailing periods mismatch in {obj!r}")

        elements = deque([groups["c1"], groups["c2"], groups["c3"]])
        if elements.count(None) < -1 * provided_level:
            raise ValueError(f"object {obj!r} does not match reference level")
        elements.rotate(provided_level)
        components = dict(
            {"table": None, "schema": None, "database": None},
            **dict(zip(("table", "schema", "database"), reversed(elements))),
        )
        # the grammar only binds objects living in the SPARK catalog:
        # another connection's object names a REMOTE table (JDBC), whose
        # catalog may legally allow characters the metastore rejects
        if connection_name == self.default_db:
            for part, value in components.items():
                if value is not None and not _VALID_COMPONENT.match(value):
                    raise ValueError(
                        f"invalid {part} name {value!r} in object {obj!r}: "
                        "the Spark catalog only accepts letters, digits and "
                        "_ in object names (it rejects anything else even "
                        "when back-quoted)"
                    )
        return DbObject(
            connection_name, components["database"], components["schema"], components["table"]
        )

    # -- prod/dev value computation ------------------------------------

    def is_from_prod(self, obj: DbObject) -> bool:
        """ref: database/objects.py:124-139.  regex.match (PREFIX
        semantics, '.' unescaped) is deliberate reference parity — the
        reference matches exactly this way (objects.py:131), so
        `from_prod: [logs.events]` also catching logs.events_v2 is the
        sayn contract, not a defect here."""
        if obj.connection_name != self.default_db:
            return False
        for regex in self.from_prod:
            if regex.match(obj.raw):
                return True
        return obj in self.sources_from_prod

    def _common_value(self, obj: DbObject, run_sensitive: bool) -> str:
        database, schema, table = obj.database, obj.schema, obj.table
        if obj.connection_name == self.default_db:
            is_prod = self.is_from_prod(obj) if run_sensitive else False
            rules = self.prod_stringify if is_prod else self.stringify
            if database is not None:
                database = rules["database"].format(database=database)
            if schema is not None:
                schema = rules["schema"].format(schema=schema)
            if table is not None:
                table = rules["table"].format(table=table)
        return self.obj_str(database, schema, table)

    @staticmethod
    def obj_str(database, schema, table) -> str:
        """Physical Spark identifier (ref per-db `_obj_str`)."""
        return ".".join(p for p in (database, schema, table) if p is not None)

    def src_value(self, obj: DbObject) -> str:
        """Name to *read* — prod-aware (ref: database/objects.py:184-185)."""
        return self._common_value(obj, True)

    def out_value(self, obj: DbObject) -> str:
        """Name to *write* — never prod (ref: database/objects.py:187-188)."""
        return self._common_value(obj, False)
