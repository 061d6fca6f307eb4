"""Native TensorBoard event-file writer — no TF dependency.

The reference's ``Logger`` writes TF Summary protos directly so it can log
scalars/images/histograms without tensor ops
(`...twoCritics_training_4fold.py:167-248`). This module goes one step
further down: it hand-encodes the protobuf wire format and the TFRecord
framing (length + masked CRC32C), so the framework's observability layer is
fully self-contained. Output is readable by standard TensorBoard.

Wire format facts used here:
- TFRecord: u64 length, u32 masked_crc(length bytes), payload,
  u32 masked_crc(payload); masked_crc = rotr15(crc32c(x)) + 0xa282ead8.
- Event proto: 1 wall_time (double), 2 step (int64), 3 file_version
  (string), 5 summary (msg). Summary: repeated 1 value. Summary.Value:
  1 tag, 2 simple_value (float), 4 image (msg), 5 histo (msg).
  Summary.Image: 1 height, 2 width, 3 colorspace, 4 encoded bytes.
  HistogramProto: 1 min, 2 max, 3 num, 4 sum, 5 sum_squares,
  6 bucket_limit (packed double), 7 bucket (packed double).
"""

from __future__ import annotations

import os
import struct
import time
from pathlib import Path

import numpy as np

# --- CRC32C (Castagnoli), table-driven --------------------------------------

_CRC_TABLE = None


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = np.zeros(256, dtype=np.uint32)
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (poly if crc & 1 else 0)
            table[i] = crc
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ int(table[(crc ^ b) & 0xFF])
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- minimal protobuf wire encoding ------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def pb_double(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def pb_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def pb_int(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def pb_bytes(field: int, v: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(v)) + v


def pb_str(field: int, v: str) -> bytes:
    return pb_bytes(field, v.encode())


def pb_packed_doubles(field: int, values) -> bytes:
    payload = b"".join(struct.pack("<d", float(v)) for v in values)
    return pb_bytes(field, payload)


# --- event building -----------------------------------------------------------


def _event(step: int | None = None, summary: bytes | None = None,
           file_version: str | None = None, wall_time: float | None = None) -> bytes:
    msg = pb_double(1, wall_time if wall_time is not None else time.time())
    if step is not None:
        msg += pb_int(2, step)
    if file_version is not None:
        msg += pb_str(3, file_version)
    if summary is not None:
        msg += pb_bytes(5, summary)
    return msg


def node_def(name: str, op: str, inputs=()) -> bytes:
    """NodeDef: 1 name, 2 op, 3 repeated input (tensorflow/graph.proto)."""
    msg = pb_str(1, name) + pb_str(2, op)
    for i in inputs:
        msg += pb_str(3, i)
    return msg


def graph_def(nodes: list[bytes]) -> bytes:
    """GraphDef: repeated 1 node."""
    return b"".join(pb_bytes(1, n) for n in nodes)


def graph_event(graph_def_bytes: bytes) -> bytes:
    """Event carrying a serialized GraphDef (Event field 4), the record the
    reference's ``log_graph`` emits (`...twoCritics_training_4fold.py:174-175`)."""
    return pb_double(1, time.time()) + pb_bytes(4, graph_def_bytes)


def scalar_summary(tag: str, value: float) -> bytes:
    val = pb_str(1, tag) + pb_float(2, float(value))
    return pb_bytes(1, val)


def image_summary(tag: str, png_bytes: bytes, height: int, width: int,
                  colorspace: int = 3) -> bytes:
    img = (pb_int(1, height) + pb_int(2, width) + pb_int(3, colorspace)
           + pb_bytes(4, png_bytes))
    val = pb_str(1, tag) + pb_bytes(4, img)
    return pb_bytes(1, val)


def histogram_summary(tag: str, values: np.ndarray, bins: int = 1000) -> bytes:
    values = np.asarray(values, dtype=np.float64).ravel()
    counts, edges = np.histogram(values, bins=bins)
    histo = (
        pb_double(1, float(values.min()))
        + pb_double(2, float(values.max()))
        + pb_double(3, float(values.size))
        + pb_double(4, float(values.sum()))
        + pb_double(5, float(np.square(values).sum()))
        # Drop the first edge: TB buckets span (-inf, edge_i] (reference's
        # Logger does the same, :234-237).
        + pb_packed_doubles(6, edges[1:])
        + pb_packed_doubles(7, counts)
    )
    val = pb_str(1, tag) + pb_bytes(5, histo)
    return pb_bytes(1, val)


class EventWriter:
    """Append-only tfevents file, TensorBoard-compatible."""

    def __init__(self, log_dir: str | Path):
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.{os.getpid()}.depgan"
        self._f = open(log_dir / fname, "ab")
        self._write_record(_event(file_version="brain.Event:2"))

    def _write_record(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))
        self._f.flush()

    def add_summary(self, summary: bytes, step: int) -> None:
        self._write_record(_event(step=step, summary=summary))

    def add_graph(self, graph_def_bytes: bytes) -> None:
        self._write_record(graph_event(graph_def_bytes))

    def close(self) -> None:
        self._f.close()
