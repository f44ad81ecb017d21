"""Deterministic content-addressed ids, computed natively on the JVM.

The reference derives ids as ``uuid5(NAMESPACE_URL, key)`` (behavior at
api/models.py:26-29,84-88) — its reproducibility anchor. RFC 4122 v5 is
just SHA-1 over (namespace bytes || name bytes) with version/variant bits
patched in, so it is expressible with built-in Spark SQL functions and
stays inside whole-stage codegen — no Python in the id path. Exactness vs
Python's ``uuid.uuid5`` is covered by tests/test_ids.py.

``sha256_id_col`` is the cross-engine variant used by driver-oracle
queries (Spark ``sha2`` ≡ DuckDB ``sha256``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# uuid.NAMESPACE_URL bytes
_NS_URL_HEX = "6ba7b8119dad11d180b400c04fd430c8"


def _key(kind: str, *parts: Column | str) -> Column:
    # concat_ws silently SKIPS null parts, so (a, NULL, b) would collide with
    # (a, b). The reference's uuid5_id raises on None (api/models.py:26-29);
    # the distributed analog is a loud task failure: coalesce is lazy, so
    # raise_error only fires when a part actually IS null.
    cols = [F.lit(kind)]
    for p in parts:
        c = F.col(p) if isinstance(p, str) else p
        cols.append(
            F.coalesce(
                c.cast("string"),
                F.raise_error(F.lit(f"id key part is NULL (kind={kind})")),
            )
        )
    return F.concat_ws(":", *cols)


def uuid5_col(kind: str, *parts: Column | str) -> Column:
    """uuid5(NAMESPACE_URL, "{kind}:{p1}:...") as a native Column (lowercase
    canonical 8-4-4-4-12 form), bit-for-bit equal to Python uuid.uuid5."""
    name = _key(kind, *parts)
    h = F.sha1(F.concat(F.unhex(F.lit(_NS_URL_HEX)), F.encode(name, "utf-8")))
    # variant nibble: (hex17 & 0x3) | 0x8  →  one of 8,9,a,b
    d = F.conv(F.substring(h, 17, 1), 16, 10).cast("int")
    variant = F.lower(F.conv((F.pmod(d, F.lit(4)) + F.lit(8)).cast("string"), 10, 16))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.concat(variant, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


def sha256_id_col(kind: str, *parts: Column | str) -> Column:
    """First 32 hex chars of sha256 over the same namespaced key — identical
    in Spark (sha2(x,256)) and DuckDB (sha256(x)), so driver-oracle queries
    can reproduce ids exactly in ANSI SQL."""
    return F.substring(F.sha2(_key(kind, *parts), 256), 1, 32)
