"""pyarrow<=0.17 legacy ``serialize``/``deserialize`` codec.

The released TED datasets are lmdb stores whose values were written with
``pyarrow.serialize(record).to_buffer()`` under pyarrow 0.14 (reference
data_preprocessor.py:41-56 writes them, lmdb_data_loader.py:108-115 reads
them with ``pyarrow.deserialize``).  ``pyarrow.serialize`` was removed in
pyarrow 2.0, so this module re-implements the wire format on top of the
*modern* pyarrow that ships here, for both directions:

overall buffer layout (arrow 0.14 ``SerializedPyObject::WriteTo``,
cpp/src/arrow/python/serialize.cc):

  int32 num_tensors | int32 num_ndarrays | int32 num_buffers
  <zero padding to 8-byte alignment>
  Arrow IPC *stream* (legacy pre-0.15 envelope, metadata V4) holding ONE
      record batch: a single dense-union column, one row — the object
  <zero padding to 64>
  per ndarray: a Tensor IPC message (legacy envelope), zero-padded to 64
  per buffer: int64 length + raw bytes

object encoding (``SequenceBuilder``): every sequence level is a dense
union whose children are created lazily in first-use order —
  bool->"bools":bool, int->"ints":int64, str->"strings":utf8,
  bytes->"bytes":binary, np.float32->"floats":float32,
  float/np.float64->"doubles":float64, None->"nones":null,
  list->"lists":list<union>, tuple->"tuples":list<union>,
  set->"sets":list<union>,
  dict->"dicts":struct{keys:list<union>, vals:list<union>},
  np.ndarray->"ndarrays":int32 index into the tensor section.
The top-level object is wrapped in a one-element sequence
(pyarrow 0.14 serialization.pxi wraps ``[value]``).

The reader dispatches on child arrow type + field name exactly like the
0.14 deserializer (cpp/src/arrow/python/deserialize.cc GetValue), so it
accepts any type-id numbering.  Tensor messages are accepted in both the
legacy and the post-0.15 continuation-marker envelope.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_ALIGN_STREAM = 8
_ALIGN_TENSOR = 64


def _pad_to(n: int, align: int) -> int:
    return (-n) % align


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------

class _SequenceBuilder:
    """One union level: children keyed by kind, created in first-use order
    (mirrors arrow 0.14 SequenceBuilder's lazy tag assignment)."""

    def __init__(self, ndarrays: list):
        self.ndarrays = ndarrays  # shared tensor table (top-level owned)
        self.type_ids: list[int] = []
        self.offsets: list[int] = []
        self.kinds: list[str] = []          # kind per tag, first-use order
        self.scalars: dict[str, list] = {}  # kind -> python values
        self.subs: dict[str, tuple[list[int], "_SequenceBuilder"]] = {}
        self.dicts: tuple[list[int], "_SequenceBuilder", "_SequenceBuilder"]\
            | None = None

    def _tag(self, kind: str) -> int:
        if kind not in self.kinds:
            self.kinds.append(kind)
        return self.kinds.index(kind)

    def _append_scalar(self, kind: str, value):
        vals = self.scalars.setdefault(kind, [])
        self.type_ids.append(self._tag(kind))
        self.offsets.append(len(vals))
        vals.append(value)

    def append(self, obj):
        if obj is None:
            self._append_scalar("nones", None)
        elif isinstance(obj, (bool, np.bool_)):
            self._append_scalar("bools", bool(obj))
        elif isinstance(obj, (int, np.integer)):
            self._append_scalar("ints", int(obj))
        elif isinstance(obj, str):
            self._append_scalar("strings", obj)
        elif isinstance(obj, bytes):
            self._append_scalar("bytes", obj)
        elif isinstance(obj, np.float32):
            self._append_scalar("floats", float(obj))
        elif isinstance(obj, (float, np.floating)):
            self._append_scalar("doubles", float(obj))
        elif isinstance(obj, np.ndarray):
            if obj.dtype == object:
                raise TypeError("object ndarrays are not supported")
            self._append_scalar("ndarrays", len(self.ndarrays))
            self.ndarrays.append(obj)
        elif isinstance(obj, dict):
            if self.dicts is None:
                self.dicts = ([0], _SequenceBuilder(self.ndarrays),
                              _SequenceBuilder(self.ndarrays))
            offs, keys, vals = self.dicts
            self.type_ids.append(self._tag("dicts"))
            self.offsets.append(len(offs) - 1)
            for k, v in obj.items():
                keys.append(k)
                vals.append(v)
            offs.append(offs[-1] + len(obj))
        elif isinstance(obj, (list, tuple, set)):
            kind = {list: "lists", tuple: "tuples",
                    set: "sets"}[type(obj)]
            if kind not in self.subs:
                self.subs[kind] = ([0], _SequenceBuilder(self.ndarrays))
            offs, sub = self.subs[kind]
            self.type_ids.append(self._tag(kind))
            self.offsets.append(len(offs) - 1)
            for item in obj:
                sub.append(item)
            offs.append(offs[-1] + len(obj))
        else:
            raise TypeError(f"cannot serialize {type(obj)!r} in the "
                            "pyarrow-0.14 legacy format")

    _SCALAR_TYPES = {"nones": pa.null(), "bools": pa.bool_(),
                     "ints": pa.int64(), "strings": pa.utf8(),
                     "bytes": pa.binary(), "floats": pa.float32(),
                     "doubles": pa.float64(), "ndarrays": pa.int32()}

    def finish(self) -> pa.UnionArray:
        children, names = [], []
        for kind in self.kinds:
            names.append(kind)
            if kind in self._SCALAR_TYPES:
                children.append(pa.array(self.scalars[kind],
                                         self._SCALAR_TYPES[kind]))
            elif kind == "dicts":
                offs, keys, vals = self.dicts
                offs = pa.array(offs, pa.int32())
                children.append(pa.StructArray.from_arrays(
                    [pa.ListArray.from_arrays(offs, keys.finish()),
                     pa.ListArray.from_arrays(offs, vals.finish())],
                    ["keys", "vals"]))
            else:  # lists / tuples / sets
                offs, sub = self.subs[kind]
                children.append(pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), sub.finish()))
        if not children:  # empty sequence: a union needs >= 1 child
            names, children = ["nones"], [pa.array([], pa.null())]
        return pa.UnionArray.from_dense(
            pa.array(self.type_ids, pa.int8()),
            pa.array(self.offsets, pa.int32()), children, names)


def _write_tensor_legacy(arr: np.ndarray, out: bytearray):
    """Append one Tensor IPC message in the pre-0.15 envelope
    (<int32 metadata_len> <flatbuffer+padding> <body>); modern
    ``write_tensor`` emits the continuation-marker envelope, so re-frame:
    the 4 bytes saved by dropping the marker are re-added as metadata
    padding to keep the body 8-aligned."""
    sink = pa.BufferOutputStream()
    pa.ipc.write_tensor(pa.Tensor.from_numpy(np.ascontiguousarray(arr)),
                        sink)
    msg = sink.getvalue().to_pybytes()
    assert msg[:4] == b"\xff\xff\xff\xff", "unexpected tensor envelope"
    (meta_len,) = struct.unpack_from("<i", msg, 4)
    meta, body = msg[8:8 + meta_len], msg[8 + meta_len:]
    out += struct.pack("<i", meta_len + 4)
    out += meta + b"\x00" * 4
    out += body


def _write_tensor_modern(arr: np.ndarray, out: bytearray):
    """Append one Tensor IPC message in the post-0.15 continuation-marker
    envelope, exactly as pyarrow 0.15-0.17's serialize wrote it."""
    sink = pa.BufferOutputStream()
    pa.ipc.write_tensor(pa.Tensor.from_numpy(np.ascontiguousarray(arr)),
                        sink)
    out += sink.getvalue().to_pybytes()


def serialize(obj, legacy_envelope: bool = True) -> bytes:
    """``pyarrow.serialize(obj).to_buffer()`` equivalent.

    legacy_envelope=True reproduces pyarrow 0.14's framing (the released
    TED datasets); False writes the post-0.15 continuation-marker framing
    that pyarrow 0.15-0.17 produced — both must deserialize identically.
    """
    ndarrays: list[np.ndarray] = []
    top = _SequenceBuilder(ndarrays)
    top.append(obj)  # the [value] wrapping: one-row top-level union
    union = top.finish()

    out = bytearray()
    out += struct.pack("<iii", 0, len(ndarrays), 0)
    out += b"\x00" * _pad_to(len(out), _ALIGN_STREAM)

    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(
        use_legacy_format=legacy_envelope,
        metadata_version=pa.ipc.MetadataVersion.V4)
    batch = pa.record_batch([union], names=["list"])
    with pa.ipc.new_stream(sink, batch.schema, options=opts) as writer:
        writer.write_batch(batch)
    out += sink.getvalue().to_pybytes()

    for arr in ndarrays:
        out += b"\x00" * _pad_to(len(out), _ALIGN_TENSOR)
        if legacy_envelope:
            _write_tensor_legacy(arr, out)
        else:
            _write_tensor_modern(arr, out)
    return bytes(out)


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------

def _decode(union: pa.UnionArray, index: int, ndarrays: list) -> object:
    """GetValue equivalent: dispatch on child type + field name
    (deserialize.cc:GetValue)."""
    tag = union.type_codes[index].as_py()
    child_pos = union.type.type_codes.index(tag)
    field = union.type.field(child_pos)
    child = union.field(child_pos)
    off = union.offsets[index].as_py()
    t = field.type
    if pa.types.is_null(t):
        return None
    if pa.types.is_int32(t):  # tensor / ndarray / buffer reference
        ref = child[off].as_py()
        if field.name in ("ndarrays", "tensors"):
            return ndarrays[ref]
        raise ValueError(f"unsupported int32 union child {field.name!r}")
    if (pa.types.is_boolean(t) or pa.types.is_int64(t)
            or pa.types.is_string(t) or pa.types.is_binary(t)
            or pa.types.is_float64(t)):
        return child[off].as_py()
    if pa.types.is_float32(t):
        return np.float32(child[off].as_py())
    if pa.types.is_list(t):
        sub = child.values
        start = child.offsets[off].as_py()
        stop = child.offsets[off + 1].as_py()
        items = [_decode(sub, i, ndarrays) for i in range(start, stop)]
        if field.name == "tuples":
            return tuple(items)
        if field.name == "sets":
            return set(items)
        return items
    if pa.types.is_struct(t):  # dict
        keys_list, vals_list = child.field("keys"), child.field("vals")
        start = keys_list.offsets[off].as_py()
        stop = keys_list.offsets[off + 1].as_py()
        keys = [_decode(keys_list.values, i, ndarrays)
                for i in range(start, stop)]
        vals = [_decode(vals_list.values, i, ndarrays)
                for i in range(start, stop)]
        return dict(zip(keys, vals))
    raise ValueError(f"unsupported union child type {t} ({field.name!r})")


def deserialize(buf: bytes | memoryview) -> object:
    """``pyarrow.deserialize(buf)`` equivalent for legacy-serialized
    values (handles both the pre-0.15 and the modern message envelope)."""
    buf = memoryview(buf)
    num_tensors, num_ndarrays, num_buffers = struct.unpack_from("<iii", buf)
    if num_tensors or num_buffers:
        raise ValueError("pyarrow.Tensor / Buffer components are not used "
                         "by the reference datasets and are unsupported")
    pos = 12 + _pad_to(12, _ALIGN_STREAM)

    reader = pa.BufferReader(pa.py_buffer(buf[pos:]))
    stream = pa.ipc.open_stream(reader)
    batches = list(stream)  # consumes through the EOS marker
    assert len(batches) == 1 and batches[0].num_rows == 1, \
        "malformed legacy-serialized object"
    pos += reader.tell()

    ndarrays = []
    full = pa.BufferReader(pa.py_buffer(buf))
    for _ in range(num_ndarrays):
        pos += _pad_to(pos, _ALIGN_TENSOR)
        full.seek(pos)
        tensor = pa.ipc.read_tensor(full)
        ndarrays.append(tensor.to_numpy())
        pos = full.tell()

    column = batches[0].column(0)
    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    return _decode(column, 0, ndarrays)
