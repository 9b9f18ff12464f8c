"""Row-identity checksums (SURVEY.md §2.7 F1/F2).

Two modes:

* ``sha256`` — bit-identical to the reference:
  ``sha2(concat_ws("", *cols), 256)``
  (/root/reference/spark_data_test/jobs/comparison_job.py:40-43).
  ``concat_ws`` implicitly casts to string and *skips* NULLs, so a row
  with (NULL, "x") collides with ("x", NULL) and with ("", "x"). Kept
  for output parity.

* ``xxhash64`` — the 100 TB path. Canonicalizes every column first:
  ``coalesce(cast(col as string), NUL-sentinel)`` joined with a
  unit-separator, so NULL, "", and column-shift collisions are
  impossible; then hashes with the JVM-side 64-bit xxHash — an order of
  magnitude cheaper than SHA-256 and 8 bytes instead of a 64-char hex
  string in the shuffle/persist footprint (matters when the narrow
  (keys, checksum) projection of a 100 TB table is what gets persisted).
"""

import pyspark.sql.functions as F

from spark_data_test_spark.constants import (
    CHECKSUM_MODE_SHA256,
    CHECKSUM_MODE_XXHASH64,
    EMPTY_STR,
)

# NUL marks NULL cells; the unit separator frames fields. Numeric,
# boolean and epoch-encoded temporal parts can never contain either
# character — but StringType values CAN, so string-ish parts are
# length-prefixed ("<n>:<payload>"): a left-to-right decoder that knows
# the schema reads the declared length and lands exactly on the next
# separator, so field boundaries are unambiguous even when payloads
# embed the sentinel characters. Binary encodes as hex; nested types
# (array/map/struct) encode as JSON because their cast-to-string form
# is lossy (["a, b"] and ["a","b"] both render "[a, b]") — JSON quotes
# and escapes element strings, so the encoding distinguishes them. The
# one remaining caveat: map entry order is not canonicalized, so two
# maps with the same entries in different insertion order hash
# differently (a false MISMATCH, which the per-column verdict then
# re-judges — never a false match).
_NULL_SENTINEL = "\x00"
_FIELD_SEP = "\x1f"


def reference_checksum(cols):
    """The reference's checksum, byte-for-byte (comparison_job.py:40-43)."""
    return F.sha2(F.concat_ws(EMPTY_STR, *[F.col(c) for c in cols]), 256)


def _canonical_part(col_name, dtype):
    """Cheapest injective per-type scalar encoding.

    Timestamp-to-string formatting is ~5x the cost of the whole hash
    (measured at sf0.1); temporal types encode as epoch numbers instead.
    Types whose string form is separator-free skip the length prefix.
    """
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        BooleanType,
        DateType,
        MapType,
        NumericType,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    col = F.col(col_name)
    if isinstance(dtype, TimestampType):
        # an instant: epoch micros is tz-independent
        encoded = F.unix_micros(col).cast("string")
    elif isinstance(dtype, TimestampNTZType):
        # wall-clock without zone: casting via the session timezone
        # would make the checksum tz-dependent (and collide across DST
        # gaps); the string form is canonical (digits/punctuation only)
        encoded = col.cast("string")
    elif isinstance(dtype, DateType):
        encoded = F.unix_date(col).cast("string")
    elif isinstance(dtype, (NumericType, BooleanType)):
        encoded = col.cast("string")
    elif isinstance(dtype, BinaryType):
        # hex is injective and separator-free; no prefix needed
        encoded = F.hex(col)
    elif isinstance(dtype, (ArrayType, MapType, StructType)):
        # cast-to-string is LOSSY for nested values; JSON quotes and
        # escapes nested strings so differing values stay distinct
        s = F.to_json(col)
        encoded = F.concat(F.length(s).cast("string"), F.lit(":"), s)
    else:
        # strings (and unknown types) can contain the separator/NUL —
        # length-prefix so field boundaries stay unambiguous
        # ("a\x1fb","c" must not equal "a","b\x1fc")
        s = col.cast("string")
        encoded = F.concat(F.length(s).cast("string"), F.lit(":"), s)
    return F.coalesce(encoded, F.lit(_NULL_SENTINEL))


def canonical_encoding(cols, dtypes=None):
    """Injective string encoding of a row: NULL-safe, separator-framed.

    ``dtypes``: optional {col -> DataType} enabling per-type fast paths.
    """
    dtypes = dtypes or {}
    parts = [_canonical_part(c, dtypes.get(c)) for c in cols]
    return F.concat_ws(_FIELD_SEP, *parts)


def canonical_checksum(cols, dtypes=None):
    """64-bit collision-hardened row checksum (scale path)."""
    return F.xxhash64(canonical_encoding(cols, dtypes)).cast("string")


def row_checksum(cols, mode=CHECKSUM_MODE_SHA256, dtypes=None):
    if mode == CHECKSUM_MODE_XXHASH64:
        return canonical_checksum(cols, dtypes)
    return reference_checksum(cols)
