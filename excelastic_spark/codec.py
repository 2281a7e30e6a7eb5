"""Posting-list compression: delta + varint (LEB128), fully vectorized.

This is the from-scratch replacement for the postings encoding the reference
delegates to Elasticsearch/Lucene (the `_bulk` writes in
/root/reference/src/main/java/com/codingchili/excelastic/model/ElasticWriter.java:180-184
hand documents to Lucene, whose postings format is delta + vint — public
knowledge, org.apache.lucene.codecs). Ours is numpy-vectorized: the encode
loop iterates over *byte slots* (<=10 for uint64), never over values, so it
runs at memory bandwidth inside Arrow batches with no per-row Python — the
north-rule hot-path requirement.

Block-max metadata (per 128-doc block: last doc_id + max BM25 impact) follows
Ding & Suel, "Faster Top-k Document Retrieval Using Block-Max Indexes"
(SIGIR 2011) — the pruning structure block-max WAND needs.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)


# ---------------------------------------------------------------- varint ---


def encode_varint_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode an array of non-negative integers; also return the
    per-value byte lengths so callers can slice the stream into sub-ranges
    (the sorted-run posting builder encodes a whole partition in ONE call
    and splits per term by these offsets). Vectorized: loops over the
    (<=10) byte positions, not over values."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    # bytes needed per value = number of 7-bit groups (>= 1)
    nbytes = np.ones(v.size, dtype=np.int64)
    rest = v >> _SEVEN
    while rest.any():
        nbytes += (rest > 0).astype(np.int64)
        rest >>= _SEVEN
    offsets = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    out = np.zeros(int(offsets[-1] + nbytes[-1]), dtype=np.uint8)
    for i in range(int(nbytes.max())):
        active = nbytes > i
        byte = ((v[active] >> _U64(7 * i)) & _MASK7).astype(np.uint8)
        cont = (nbytes[active] > i + 1).astype(np.uint8) << 7
        out[offsets[active] + i] = byte | cont
    return out.tobytes(), nbytes


def encode_varint(values: np.ndarray) -> bytes:
    return encode_varint_with_lengths(values)[0]


def decode_varint(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_varint`. Vectorized, tiered by the widest
    value in the stream:

    * all 1-byte (every value < 128): straight byte widen — one pass.
      The common case for monster-df posting streams (doc-id deltas ~1,
      small tfs).
    * all <= 3 bytes (values < 2^21): little-endian shift-or on the last
      bytes of each value via two masked fancy-index passes — no
      per-byte uint64 temporaries. Covers doclens and the per-salted-row
      leading absolute doc_ids.
    * otherwise: the general per-byte reduceat path.

    Profiled 2-8x over the general path on hot-term lookup streams."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    if ends.size == 0 or ends[-1] != b.size - 1:
        raise ValueError("truncated varint stream")
    if ends.size == b.size:
        return b.astype(_U64)
    lens = np.empty(ends.size, dtype=np.int64)
    lens[0] = ends[0] + 1
    np.subtract(ends[1:], ends[:-1], out=lens[1:])
    if int(lens.max()) <= 3:
        vals = b[ends].astype(_U64)
        m2 = lens >= 2
        e2 = ends[m2]
        vals[m2] = (vals[m2] << _SEVEN) | (b[e2 - 1] & _MASK7)
        m3 = lens == 3
        if m3.any():
            e3 = ends[m3]
            vals[m3] = (vals[m3] << _SEVEN) | (b[e3 - 2] & _MASK7)
        return vals
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # value index for every byte
    bump = np.zeros(b.size, dtype=np.int64)
    bump[starts[1:]] = 1
    vid = np.cumsum(bump)
    within = (np.arange(b.size, dtype=np.int64) - starts[vid]).astype(_U64)
    contrib = (b & 0x7F).astype(_U64) << (_SEVEN * within)
    return np.add.reduceat(contrib, starts)


# ----------------------------------------------------------------- delta ---


def encode_delta_varint(sorted_ids: np.ndarray) -> bytes:
    """Delta-encode a strictly increasing uint64 array, then varint-pack.
    First value is stored as-is; the rest as gaps."""
    ids = np.ascontiguousarray(sorted_ids, dtype=_U64)
    if ids.size == 0:
        return b""
    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    return encode_varint(deltas)


def decode_delta_varint(buf: bytes) -> np.ndarray:
    deltas = decode_varint(buf)
    return np.cumsum(deltas, dtype=_U64)


# ------------------------------------------------------------- block-max ---


def block_metadata(
    doc_ids: np.ndarray, impacts: np.ndarray, block_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block (last_doc_id, max_impact) for block-max WAND.

    ``impacts`` are the doc-level BM25 impacts (score / idf); blocks are
    consecutive runs of ``block_size`` postings in doc_id order.
    Returns (uint64[n_blocks], float64[n_blocks]).
    """
    n = doc_ids.size
    if n == 0:
        return np.empty(0, dtype=_U64), np.empty(0, dtype=np.float64)
    n_blocks = (n + block_size - 1) // block_size
    last_idx = np.minimum(np.arange(1, n_blocks + 1) * block_size, n) - 1
    block_last = np.ascontiguousarray(doc_ids, dtype=_U64)[last_idx]
    starts = np.arange(n_blocks) * block_size
    block_max = np.maximum.reduceat(
        np.ascontiguousarray(impacts, dtype=np.float64), starts
    )
    return block_last, block_max


def f64_to_bytes(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr, dtype="<f8").tobytes()


def f64_from_bytes(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<f8")


def u64_to_bytes(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr, dtype="<u8").tobytes()


def u64_from_bytes(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<u8")


# --------------------------------------------------------------- scoring ---


def bm25_idf(n_docs: int, df: np.ndarray | int) -> np.ndarray | float:
    """Lucene-style BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5)).

    Public formula (Robertson/Sparck-Jones as shipped in Lucene
    BM25Similarity — the ES default the reference targets, README.md:21,25)."""
    dfa = np.asarray(df, dtype=np.float64)
    return np.log1p((n_docs - dfa + 0.5) / (dfa + 0.5))


def bm25_impact(
    tf: np.ndarray, doclen: np.ndarray, avgdl: float, k1: float, b: float
) -> np.ndarray:
    """Doc-level BM25 impact (score without the idf factor), float64:
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))."""
    tff = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doclen, dtype=np.float64)
    return tff * (k1 + 1.0) / (tff + k1 * (1.0 - b + b * dl / avgdl))
