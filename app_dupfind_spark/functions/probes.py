"""Byte-sample probe expressions — the reference's "weed pass" algorithms
as pure column expressions.

The reference reads <=64-byte samples at first/middle/last offsets with
sysseek/sysread (/root/reference/lib/App/dupfind/Guts/Algorithms.pm:16-160)
to cheaply split same-size groups before hashing.  Here ``text`` is
already a column, so each probe is a ``substring`` expression: zero I/O,
whole-stage-codegen'd, and Catalyst computes them once per row.

Offset parity with the reference (1-based substring vs 0-based seek):

- first n:   seek 0, read n          -> substring(t, 1, n)
- last n:    seek size-n, read n     -> substring(t, greatest(len-n+1, 1), n)
- middle 1:  seek int(size/2), read 1 -> substring(t, floor(len/2)+1, 1)
- offset n:  seek int(size/3), read n -> substring(t, floor(len/3)+1, n)

Semantics preserved from the reference:
- first_middle_last returns ONLY the first-bytes probe when the text is
  shorter than the probe width (Algorithms.pm:78 early return).
- almost_middle returns NULL when len <= n (Algorithms.pm:145 undef) —
  the null rides through grouping null-safely (recall-preserving, the
  reference keeps probe-failed files as potential dups, Guts.pm:137,158).

We operate on characters of ``text`` (the graft's unit of content),
where the reference used bytes of file content; the cascade's semantics
(sound prefilter: equal text => equal probes) are unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def first_chars(col: Column, n: int) -> Column:
    """Ref: _get_first_bytes (Algorithms.pm:16-33)."""
    return F.substring(col, 1, n)


def last_chars(col: Column, n: int) -> Column:
    """Ref: _get_last_bytes (Algorithms.pm:93-112)."""
    start = F.greatest(F.length(col) - F.lit(n) + F.lit(1), F.lit(1))
    return col.substr(start, F.lit(n))


def middle_char(col: Column) -> Column:
    """Ref: _get_middle_byte (Algorithms.pm:114-135): 1 char at int(len/2)."""
    start = (F.floor(F.length(col) / 2) + 1).cast("int")
    return col.substr(start, F.lit(1))


def middle_last_chars(col: Column, n: int) -> Column:
    """Ref: _get_middle_last_bytes (Algorithms.pm:35-60)."""
    return F.concat(middle_char(col), last_chars(col, n))


def first_middle_last_chars(col: Column, n: int) -> Column:
    """Ref: _get_first_middle_last_bytes (Algorithms.pm:62-91).

    Short-input branch (len <= n -> first probe only, line 78) is a real
    semantic and is preserved.
    """
    return F.when(F.length(col) <= n, first_chars(col, n)).otherwise(
        F.concat(first_chars(col, n), middle_char(col), last_chars(col, n))
    )


def almost_middle_chars(col: Column, n: int) -> Column:
    """Ref: _get_bytes_n_offset_n (Algorithms.pm:137-160): n chars at
    int(len/3); NULL when len <= n (undef in the reference)."""
    start = (F.floor(F.length(col) / 3) + 1).cast("int")
    return F.when(F.length(col) > n, col.substr(start, F.lit(n)))


# The weed-pass registry: name -> factory(col, width) -> Column.
# Mirrors the reference's wpmap (Guts.pm:43-53); composable and ordered
# via DedupConfig.weed_passes like --wpass (bin/dupfind:127-143).
WEED_PASS_REGISTRY = {
    "first": first_chars,
    "last": last_chars,
    "middle": lambda col, n: middle_char(col),
    "middle_last": middle_last_chars,
    "first_middle_last": first_middle_last_chars,
    "almost_middle": almost_middle_chars,
}
