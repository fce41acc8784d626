"""Deterministic Fabric ID generation as Catalyst column expressions.

The reference has two ID schemes: a lock-guarded sequential counter for RDF
(reference: src/shared/utilities/id_generator.py:47-71) and a deterministic
sha256 hash for DTDL (reference: src/formats/dtdl/dtdl_converter.py:486-512).
The hash scheme is order-independent and parallelizable, so this engine
adopts it for ALL formats (documented divergence; the reference's own tests
assert only ID validity/uniqueness, e.g. tests/cdm/test_cdm_converter.py:344).

Exact bit-parity with the reference's DTDL scheme:
    id = str(1_000_000_000_000 + int.from_bytes(sha256(key)[:8], 'big') % 10**12)
computed JVM-side without 64-bit overflow by splitting the 16-hex-digit
prefix into 4+12 digits:  (hi4 * (2^48 mod 10^12) + lo12) mod 10^12.

Property IDs: entity_id + 4 digits from md5(property_name)
(reference: dtdl_converter.py:514-527).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ID_PREFIX = 1_000_000_000_000
_MOD = 1_000_000_000_000
_POW48_MOD = (1 << 48) % _MOD  # 474976710656


def fabric_id(key: Column) -> Column:
    """13-digit numeric-string entity/relationship ID from a key string."""
    h = F.sha2(key, 256)
    hi = F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 5, 12), 16, 10).cast("long")
    val = F.pmod(hi * F.lit(_POW48_MOD) + lo, F.lit(_MOD))
    return (F.lit(ID_PREFIX) + val).cast("string")


def clean_dtmi(dtmi: Column) -> Column:
    """Strip 'dtmi:' prefix and ';version' — the reference's hash key."""
    return F.substring_index(F.regexp_replace(dtmi, "^dtmi:", ""), ";", 1)


def dtmi_fabric_id(dtmi: Column) -> Column:
    return fabric_id(clean_dtmi(dtmi))


def property_id(entity_id: Column, prop_name: Column) -> Column:
    """entity_id + 4-digit md5-derived suffix (unique within the entity)."""
    suffix = F.pmod(F.conv(F.substring(F.md5(prop_name), 1, 8), 16, 10)
                    .cast("long"), F.lit(10_000))
    return F.concat(entity_id, F.lpad(suffix.cast("string"), 4, "0"))


def fabric_id_py(key: str) -> str:
    """Driver-side twin (used in tests to cross-check the column version)."""
    import hashlib
    h = hashlib.sha256(key.encode()).digest()
    return str(ID_PREFIX + int.from_bytes(h[:8], "big") % _MOD)


def property_id_py(entity_id: str, prop_name: str) -> str:
    import hashlib
    return f"{entity_id}{int(hashlib.md5(prop_name.encode()).hexdigest()[:8], 16) % 10000:04d}"
