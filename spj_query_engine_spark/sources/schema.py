"""The ``.det`` table-definition DSL → Spark ``StructType``.

Format (parsed by the reference at ``src/RandomDB.java:41-111``)::

    <numCols>
    <tupleSizeBytes>
    <colname> <INTEGER|STRING|REAL> <range> <PK|FK|NK> <bytes>

``range`` is the generator value domain: ints/reals draw from ``[0, range)``;
for strings it is the length in characters.  ``PK`` columns draw distinct
values; ``FK`` columns draw values that exist in the referenced parent column
(the reference tracks emitted PK values in memory,
``src/RandomDB.java:117-144``).

Type mapping per FIXTURES.md: INTEGER → IntegerType, STRING → StringType,
REAL → DoubleType (the reference's ``Float`` runtime value is an
implementation detail).  No column is nullable — the generator emits a value
for every field, and the dialect has no ``NULL`` literal.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

_TYPE_MAP = {
    "INTEGER": T.IntegerType(),
    "STRING": T.StringType(),
    "REAL": T.DoubleType(),
}


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    ctype: str  # INTEGER | STRING | REAL
    range: int  # value domain [0, range) — or string length
    key: str  # PK | FK | NK
    nbytes: int = 4

    def spark_type(self) -> T.DataType:
        return _TYPE_MAP[self.ctype]


@dataclass(frozen=True)
class TableSpec:
    name: str
    columns: tuple[ColumnSpec, ...]
    tuple_size: int = 0
    #: FK column name → (parent spec name, parent column name); filled by the
    #: caller, the ``.det`` format itself does not record the referenced table.
    fk_refs: dict = field(default_factory=dict)

    def column(self, name: str) -> ColumnSpec:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)


def parse_det(name: str, text: str) -> TableSpec:
    """Parse a ``.det`` file body into a :class:`TableSpec`."""
    lines = [ln.strip() for ln in text.strip().splitlines() if ln.strip()]
    ncols = int(lines[0])
    tuple_size = int(lines[1])
    cols = []
    for ln in lines[2 : 2 + ncols]:
        parts = ln.split()
        if len(parts) != 5:
            raise ValueError(f"bad .det column line: {ln!r}")
        cname, ctype, rng, key, nbytes = parts
        if ctype not in _TYPE_MAP:
            raise ValueError(f"unknown type {ctype!r} (INTEGER|STRING|REAL)")
        if key not in ("PK", "FK", "NK"):
            raise ValueError(f"unknown key class {key!r} (PK|FK|NK)")
        cols.append(ColumnSpec(cname, ctype, int(rng), key, int(nbytes)))
    if len(cols) != ncols:
        raise ValueError(f"expected {ncols} columns, found {len(cols)}")
    return TableSpec(name=name, columns=tuple(cols), tuple_size=tuple_size)


def spec_to_struct(spec: TableSpec) -> T.StructType:
    return T.StructType(
        [T.StructField(c.name, c.spark_type(), nullable=False) for c in spec.columns]
    )
