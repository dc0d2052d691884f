"""``version`` field type — semver-precedence sort/range/term.

Reference: x-pack mapper-version ``VersionEncoder.java`` (encode a
version string into a byte key whose raw byte order IS semver
precedence, semver.org §11) and ``VersionStringFieldMapper.java``.
Ordering rules reproduced here:

- numeric major/minor/patch groups compare numerically (length-prefixed
  digit groups: marker ``0x01`` + length byte with the high bit set, so
  longer digit runs sort after shorter ones before byte comparison);
- a pre-release version sorts BEFORE the plain release of the same main
  version (separator ``0x02`` vs ``0x03``);
- pre-release identifiers compare left to right, numeric ones
  numerically (and before alphanumeric ones — the ``0x01`` marker is
  below any printable byte), alphanumeric ones in ASCII order;
- the optional ``+build`` suffix is an ASCII-ordered tiebreak;
- invalid version strings keep their raw bytes, which start above
  ``0x03``, so every valid version sorts before every invalid one;
  the empty string becomes ``0x03`` alone (after valid prereleases,
  like the reference's ENCODED_EMPTY_STRING).

The key is attached per batch (tiny per-row string work over a
compiled regex) and Ray's distributed sort runs on the key bytes —
no driver-side ordering.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from ray.data import Dataset

# re.ASCII: the reference's Java \d is ASCII-only, so a Unicode digit
# must make the string illegal (raw-bytes key), never reach the encoder
_MAIN_RE = re.compile(r"(0|[1-9]\d*)(\.(0|[1-9]\d*))*", re.ASCII)
_PRE_RE = re.compile(
    r"-((?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*)"
    r"(?:\.(?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*))*)", re.ASCII)
_BUILD_RE = re.compile(r"\+([0-9a-zA-Z-]+(?:\.[0-9a-zA-Z-]+)*)", re.ASCII)

_NUM_MARK = b"\x01"
_PRE_SEP = b"\x02"
_NO_PRE_SEP = b"\x03"


def _split_parts(v: str):
    """(main, prerelease-or-None, build-or-None), reference
    VersionParts.ofVersion order: build suffix first, then prerelease."""
    build = None
    plus = v.find("+")
    if plus > 0:  # a LEADING separator is not a separator (start > 0)
        build = v[plus:]
        v = v[:plus]
    pre = None
    dash = v.find("-")
    if dash > 0:
        pre = v[dash:]
        v = v[:dash]
    return v, pre, build


def _legal(main: str, pre: str | None, build: str | None) -> bool:
    if not _MAIN_RE.fullmatch(main or ""):
        return False
    if pre is not None and not _PRE_RE.fullmatch(pre):
        return False
    if build is not None and not _BUILD_RE.fullmatch(build):
        return False
    return True


def _digit_groups(s: str, out: bytearray) -> None:
    i = 0
    while i < len(s):
        if s[i].isdigit():
            j = i
            while j < len(s) and s[j].isdigit():
                j += 1
            if j - i >= 128:
                raise ValueError("digit group longer than 127")
            out += _NUM_MARK
            out.append((j - i) | 0x80)
            out += s[i:j].encode()
            i = j
        else:
            out += s[i].encode()
            i += 1


def encode_version(v: str) -> bytes:
    """Sortable byte key (VersionEncoder.encodeVersion analog)."""
    if v == "":
        return bytes(_NO_PRE_SEP)
    main, pre, build = _split_parts(v)
    if not _legal(main, pre, build):
        return v.encode()
    out = bytearray()
    _digit_groups(main, out)
    if pre is not None:
        out += _PRE_SEP
        out += b"-"
        for i, part in enumerate(pre[1:].split(".")):
            if i:
                out += b"."
            if part.isdigit():
                _digit_groups(part, out)
            else:
                out += part.encode()
    else:
        out += _NO_PRE_SEP
    if build is not None:
        out += build.encode()
    return bytes(out)


def is_valid_version(v: str) -> bool:
    main, pre, build = _split_parts(v)
    return _legal(main, pre, build)


def decode_version(encoded: bytes) -> str:
    """Inverse of :func:`encode_version` (VersionEncoder.decodeVersion):
    drop the 0x01+length pairs and the 0x02/0x03 separators — what is
    left is the original string, proving the encoding injective."""
    out = bytearray()
    i, n = 0, len(encoded)
    while i < n:
        b = encoded[i]
        if b == 0x01:
            i += 2  # numeric marker + length byte
            continue
        if b not in (0x02, 0x03):
            out.append(b)
        i += 1
    return out.decode("utf-8")


def add_version_key(ds: Dataset, col: str,
                    key_col: str = "_version_key") -> Dataset:
    """Attach the sortable key as a binary column (compute-on-scan)."""
    def key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[key_col] = [encode_version(v) for v in df[col].astype(str)]
        return df

    return ds.map_batches(key, batch_format="pandas")


def sort_by_version(ds: Dataset, col: str, descending: bool = False,
                    keep_key: bool = False) -> Dataset:
    """Distributed semver-precedence sort on the encoded key."""
    out = add_version_key(ds, col).sort("_version_key",
                                        descending=descending)
    if keep_key:
        return out

    def drop(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=["_version_key"])
    return out.map_batches(drop, batch_format="pandas")


def version_range(ds: Dataset, col: str, gte: str | None = None,
                  lte: str | None = None, gt: str | None = None,
                  lt: str | None = None) -> Dataset:
    """Range filter in ENCODED space (VersionStringFieldType.rangeQuery):
    bounds are encoded with the same key, so "1.2" < "1.10" etc."""
    lo = encode_version(gte) if gte is not None else \
        encode_version(gt) if gt is not None else None
    lo_strict = gt is not None and gte is None
    hi = encode_version(lte) if lte is not None else \
        encode_version(lt) if lt is not None else None
    hi_strict = lt is not None and lte is None

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        keys = [encode_version(v) for v in df[col].astype(str)]
        mask = []
        for k in keys:
            ok = True
            if lo is not None:
                ok = k > lo if lo_strict else k >= lo
            if ok and hi is not None:
                ok = k < hi if hi_strict else k <= hi
            mask.append(ok)
        return df[pd.Series(mask, index=df.index)]

    return ds.map_batches(keep, batch_format="pandas")


def version_term(ds: Dataset, col: str, value: str) -> Dataset:
    """Term query: the mapper re-encodes the search value and matches
    encoded bytes — the encoding is injective (see decode_version), so
    this is exactly raw string equality."""
    import pyarrow.compute as pc

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch[col], pa.scalar(value)))

    return ds.map_batches(keep, batch_format="pyarrow")


def version_wildcard(ds: Dataset, col: str, pattern: str,
                     case_insensitive: bool = False) -> Dataset:
    """Wildcard query (VersionFieldWildcardQuery): the reference runs the
    automaton over encoded bytes SKIPPING the marker/length bytes, i.e.
    it matches the DECODED original string — so match the raw strings."""
    import fnmatch

    rx = re.compile(fnmatch.translate(pattern),
                    re.IGNORECASE if case_insensitive else 0)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = [v is not None and rx.match(str(v)) is not None
             for v in df[col]]
        return df[pd.Series(m, index=df.index)]

    return ds.map_batches(keep, batch_format="pandas")


def version_prefix(ds: Dataset, col: str, prefix: str,
                   case_insensitive: bool = False) -> Dataset:
    """prefixQuery == wildcardQuery(value + '*') in the mapper."""
    return version_wildcard(ds, col, prefix + "*", case_insensitive)
