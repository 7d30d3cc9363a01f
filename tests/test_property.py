"""Property-based tests (hypothesis) for the two hand-written pure-Python
kernels where a fuzzer earns its keep:

- the in-repo LZ4 frame decoder (`iyp_spark/sources.py` — written from the
  public frame/block format spec because the `lz4` package is not in the
  sandbox): round-trip against an independent in-test compressor that
  emits every encoding feature the decoder must handle (literal-length and
  match-length extension bytes, overlapping matches incl. offset-1 RLE,
  multi-block frames, uncompressed blocks, optional content-size field);

- the PSL classifier (`iyp_spark/psl.py py_public_suffix` et al. — a
  from-scratch longest-match implementation over the full public suffix
  list): structural invariants that must hold for EVERY input, plus a
  compositional check against the parsed rule sets themselves.

No SparkSession — these run in milliseconds and exercise exactly the code
the Spark exprs are built from.
"""

from __future__ import annotations

import struct

from hypothesis import given, assume, settings, strategies as st

from iyp_spark.sources import lz4_frame_decompress
from iyp_spark import psl


# ===================================================================== lz4

def _emit_seq(out: bytearray, lit: bytes, match_len: int | None = None,
              offset: int | None = None) -> None:
    ll = len(lit)
    ml = 0 if match_len is None else match_len - 4
    token_ll = 15 if ll >= 15 else ll
    token_ml = (15 if ml >= 15 else ml) if match_len is not None else 0
    out.append((token_ll << 4) | token_ml)
    if ll >= 15:
        rem = ll - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += lit
    if match_len is not None:
        out += offset.to_bytes(2, "little")
        if ml >= 15:
            rem = ml - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)


def _compress_block(data: bytes, max_offset: int = 64) -> bytes:
    """Naive but spec-correct LZ4 block compressor: greedy longest match
    over small offsets (includes offset < length, i.e. overlapping / RLE
    matches, the decoder's trickiest path); everything else literals.
    Independent of the decoder under test."""
    out = bytearray()
    i, lit_start, n = 0, 0, len(data)
    while i < n:
        best = None
        if i >= 1 and n - i >= 4:
            for off in range(1, min(i, max_offset) + 1):
                length = 0
                while (i + length < n and length < 0x4FFF
                       and data[i + length - off] == data[i + length]):
                    length += 1
                if length >= 4 and (best is None or length > best[0]):
                    best = (length, off)
        if best:
            # spec: the last 5 bytes of a block are always literals; keep
            # clear of the tail so the final sequence stays literal-only
            if i + best[0] > n - 5:
                best = None
        if best:
            _emit_seq(out, data[lit_start:i], best[0], best[1])
            i += best[0]
            lit_start = i
        else:
            i += 1
    _emit_seq(out, data[lit_start:])
    return bytes(out)


def _frame(data: bytes, block_size: int = 0, content_size: bool = False,
           raw_blocks: bool = False) -> bytes:
    """Wrap ``data`` in an LZ4 frame. block_size=0 → single block;
    raw_blocks=True stores blocks uncompressed (high bit of block size)."""
    flg = (0b01 << 6) | (0x08 if content_size else 0)
    header = struct.pack("<I", 0x184D2204) + bytes([flg, 0x40])
    if content_size:
        header += struct.pack("<Q", len(data))
    header += b"\x00"  # header checksum byte (decoder skips it)
    body = bytearray()
    chunks = ([data[i:i + block_size] for i in range(0, len(data), block_size)]
              if block_size else [data]) or [data]
    for chunk in chunks:
        if raw_blocks:
            body += struct.pack("<I", 0x80000000 | len(chunk)) + chunk
        else:
            comp = _compress_block(chunk)
            body += struct.pack("<I", len(comp)) + comp
    body += struct.pack("<I", 0)  # EndMark
    return header + bytes(body)


# low-entropy bytes: repeated small chunks force real matches (incl. RLE)
_repetitive = st.builds(
    lambda chunk, reps, tail: chunk * reps + tail,
    st.binary(min_size=1, max_size=12),
    st.integers(min_value=1, max_value=400),
    st.binary(max_size=20),
)


@settings(max_examples=200, deadline=None)
@given(data=st.one_of(st.binary(max_size=3000), _repetitive))
def test_lz4_roundtrip_single_block(data):
    assert lz4_frame_decompress(_frame(data)) == data


@settings(max_examples=100, deadline=None)
@given(data=st.one_of(st.binary(max_size=3000), _repetitive),
       block_size=st.integers(min_value=1, max_value=257),
       content_size=st.booleans())
def test_lz4_roundtrip_multi_block(data, block_size, content_size):
    frame = _frame(data, block_size=block_size, content_size=content_size)
    assert lz4_frame_decompress(frame) == data


@settings(max_examples=100, deadline=None)
@given(data=st.binary(max_size=2000),
       block_size=st.integers(min_value=1, max_value=300))
def test_lz4_roundtrip_uncompressed_blocks(data, block_size):
    frame = _frame(data, block_size=block_size, raw_blocks=True)
    assert lz4_frame_decompress(frame) == data


# ===================================================================== psl

_LABEL = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-",
                 min_size=1, max_size=12).filter(
                     lambda s: not s.startswith("-") and not s.endswith("-"))

_NAME = st.lists(_LABEL, min_size=1, max_size=6).map(".".join)

_EXACT, _WILD, _EXC = psl._rule_sets(include_private=False)
# a stable sample of real exact rules to compose hostnames from
_EXACT_SAMPLE = sorted(".".join(r) for r in _EXACT)[::97][:200]


@settings(max_examples=300, deadline=None)
@given(name=_NAME)
def test_psl_structural_invariants(name):
    """For ANY input: the suffix is a dot-suffix of the name; the
    registered domain is exactly one label + the suffix; classification is
    case-insensitive; registered_domain is idempotent; fqdn agrees."""
    suffix = psl.py_public_suffix(name)
    rd = psl.py_registered_domain(name)
    if suffix is not None:
        assert name.lower() == suffix or name.lower().endswith("." + suffix)
    if rd is not None:
        assert suffix is not None
        assert rd.count(".") == suffix.count(".") + 1
        assert rd == rd.lower() and rd.endswith("." + suffix)
        assert psl.py_registered_domain(rd) == rd  # idempotent
        assert psl.py_fqdn(name) == name.lower()
    else:
        assert psl.py_fqdn(name) is None
    assert psl.py_public_suffix(name.upper()) == suffix
    assert psl.py_registered_domain(name.upper()) == rd


@settings(max_examples=300, deadline=None)
@given(label=_LABEL, suffix=st.sampled_from(_EXACT_SAMPLE))
def test_psl_compositional_vs_rule_sets(label, suffix):
    """label + a real exact rule registers as label.rule — unless the rule
    sets themselves say otherwise (a wildcard under the rule, or the
    composed name hitting a longer rule), which we exclude explicitly."""
    stpl = tuple(suffix.split("."))
    assume(("*",) + stpl not in _WILD)
    assume((label,) + stpl not in _EXACT)
    assume((label,) + stpl not in _EXC)
    assume(("*",) + stpl[:-1] not in _WILD or len(stpl) < 2)
    name = f"{label}.{suffix}"
    assert psl.py_public_suffix(name) == suffix
    assert psl.py_registered_domain(name) == name
    assert psl.py_registered_domain(f"www.{name}") == name
