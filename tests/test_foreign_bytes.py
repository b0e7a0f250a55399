"""Foreign-bytes hardening for the wire-format readers (lmdb_mini,
pyarrow_legacy).

The released TED datasets were written by real liblmdb + pyarrow 0.14,
neither of which ships in this image — so beyond the writer/reader
round-trips in test_lmdb_import.py, these tests attack the structural cases
a foreign writer produces and ours doesn't by default:

* LMDB: B-tree depth >= 3 (thousands of keys), values spanning >= 3
  overflow pages, stale/alternating meta pages (liblmdb ping-pongs between
  meta 0 and 1 per transaction), and FRAGMENTED page order (an
  incrementally-built file has pages in allocation order, not key order —
  simulated by permuting the page units of a well-formed file and fixing
  every page pointer).
* pyarrow legacy codec: the post-0.15 continuation-marker envelopes that
  pyarrow 0.15-0.17's serialize wrote (the reader must accept both),
  adversarial nested objects, and property-based round-trip fuzzing.
  The structural layer is cross-validated against REAL pyarrow: the
  record-batch stream and tensor messages are parsed by the modern
  pyarrow bundled here, not by our own code.
"""

import struct

import numpy as np
import pytest

from ha2g_tpu.data import pyarrow_legacy as pal
from ha2g_tpu.data.lmdb_mini import (HDR, MAGIC, NODEMAX, P_BRANCH, P_LEAF,
                                     P_META, P_OVERFLOW, PAGE, P_INVALID,
                                     F_BIGDATA, MiniLmdbReader, write_lmdb)


# ---------------------------------------------------------------------------
# pyarrow legacy codec vs post-0.15 envelopes + adversarial objects
# ---------------------------------------------------------------------------

ADVERSARIAL = [
    {"empty": [], "also": {}, "t": (), "s": set()},
    [""] * 3 + [b"", "0", 0, 0.0, False, None],
    {"unicode": "é你好\U0001f600", "bytes": b"\x00\xff\x7f"},
    [True, 1, False, 0, 1.0],                      # bool/int/float tagging
    [-(2 ** 62), 2 ** 62, -1, 0],
    {"k": [{"deep": [({"deeper": ["x"]},)]}]},
    [np.float32(1.5), 2.5, np.float64(3.5)],
    {(1, 2): "tuple-key", "mixed": {3: [4, {5: (6,)}]}},
]


def _norm_scalar(x):
    """pyarrow 0.14 returned PYTHON scalars for int64/double/bool children;
    normalize numpy scalar inputs the same way before comparing."""
    if isinstance(x, np.bool_):
        return bool(x)
    if isinstance(x, np.integer):
        return int(x)
    if isinstance(x, np.float64):
        return float(x)
    return x


def _req(a, b):
    """Recursive equality that handles ndarrays and float32 wrappers."""
    a, b = _norm_scalar(a), _norm_scalar(b)
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        return
    if isinstance(a, dict):
        assert set(a) == set(b)
        for k in a:
            _req(a[k], b[k])
        return
    if isinstance(a, (list, tuple)):
        assert type(a) is type(b) and len(a) == len(b)
        for x, y in zip(a, b):
            _req(x, y)
        return
    assert a == b and type(a) is type(b), (a, b)


@pytest.mark.parametrize("obj", ADVERSARIAL)
@pytest.mark.parametrize("legacy", [True, False])
def test_adversarial_objects_both_envelopes(obj, legacy):
    got = pal.deserialize(pal.serialize(obj, legacy_envelope=legacy))
    _req(got, obj)


@pytest.mark.parametrize("legacy", [True, False])
def test_tensor_sections_both_envelopes(legacy):
    rng = np.random.default_rng(0)
    obj = {"a": rng.normal(size=(7, 5)).astype(np.float32),
           "b": np.arange(11, dtype=np.int64),
           "c": [rng.normal(size=(2, 3, 4)).astype(np.float16),
                 np.asarray(3.25, np.float64).reshape(())],
           "d": np.asarray([], np.int32),
           "noncontig": np.ascontiguousarray(
               rng.normal(size=(6, 6)))[::2, ::3]}
    got = pal.deserialize(pal.serialize(obj, legacy_envelope=legacy))
    for k in obj:
        if isinstance(obj[k], list):
            for x, y in zip(got[k], obj[k]):
                np.testing.assert_array_equal(x, y)
                assert x.dtype == y.dtype
        else:
            np.testing.assert_array_equal(got[k], obj[k])
            assert got[k].dtype == obj[k].dtype


def _random_obj(rng, depth=0):
    kinds = ["int", "float", "str", "bytes", "bool", "none", "f32", "arr"]
    if depth < 4:
        kinds += ["list", "tuple", "dict"] * 2
    k = kinds[rng.integers(0, len(kinds))]
    if k == "int":
        return int(rng.integers(-2 ** 40, 2 ** 40))
    if k == "float":
        return float(rng.normal())
    if k == "str":
        return "".join(chr(rng.integers(32, 0x2FA0))
                       for _ in range(rng.integers(0, 12)))
    if k == "bytes":
        return bytes(rng.integers(0, 256, rng.integers(0, 16),
                                  dtype=np.uint8))
    if k == "bool":
        return bool(rng.integers(0, 2))
    if k == "none":
        return None
    if k == "f32":
        return np.float32(rng.normal())
    if k == "arr":
        dt = [np.float32, np.float64, np.int32, np.int64,
              np.uint8][rng.integers(0, 5)]
        shape = tuple(rng.integers(0, 5, rng.integers(0, 3)))
        return (rng.normal(size=shape) * 100).astype(dt)
    n = rng.integers(0, 5)
    if k == "list":
        return [_random_obj(rng, depth + 1) for _ in range(n)]
    if k == "tuple":
        return tuple(_random_obj(rng, depth + 1) for _ in range(n))
    return {f"k{i}": _random_obj(rng, depth + 1) for i in range(n)}


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_round_trip(seed):
    rng = np.random.default_rng(seed)
    obj = [_random_obj(rng) for _ in range(4)]
    legacy = bool(seed % 2)
    _req(pal.deserialize(pal.serialize(obj, legacy_envelope=legacy)), obj)


# ---------------------------------------------------------------------------
# LMDB structural cases
# ---------------------------------------------------------------------------

def test_btree_depth_three(tmp_path):
    """Thousands of sized keys force two branch levels above the leaves;
    traversal must return every record in key order."""
    rng = np.random.default_rng(1)
    records = {f"key-{i:06d}".encode(): bytes(
        rng.integers(0, 256, 300, dtype=np.uint8)) for i in range(2500)}
    write_lmdb(tmp_path / "deep", records)
    r = MiniLmdbReader(tmp_path / "deep")
    assert r.meta["depth"] >= 3, r.meta
    items = [(k, bytes(v)) for k, v in r.items()]
    assert [k for k, _ in items] == sorted(records)
    assert dict(items) == records
    assert bytes(r.get(b"key-001234")) == records[b"key-001234"]
    r.close()


def test_overflow_chain_three_plus_pages(tmp_path):
    """Values spanning 3, 4 and 5 overflow pages, interleaved with small
    values; exact byte fidelity across the chains."""
    rng = np.random.default_rng(2)
    sizes = [3 * PAGE - 200, 3 * PAGE + 123, 4 * PAGE + 1, 17, NODEMAX - 20,
             5 * PAGE]
    records = {f"v{i}".encode(): bytes(rng.integers(0, 256, s,
                                                    dtype=np.uint8))
               for i, s in enumerate(sizes)}
    write_lmdb(tmp_path / "ov", records)
    r = MiniLmdbReader(tmp_path / "ov")
    for k, want in records.items():
        assert bytes(r.get(k)) == want, k
    r.close()


def test_meta_page_selection(tmp_path):
    """liblmdb alternates between meta pages per commit; the reader must
    take the larger txnid, whichever slot holds it."""
    records = {b"a": b"1", b"b": b"2"}
    data = write_lmdb(tmp_path / "meta", records)
    raw = bytearray(data.read_bytes())

    def patch_meta(pgno, txnid=None, root=None, entries=None):
        off = pgno * PAGE + HDR
        if txnid is not None:
            struct.pack_into("<Q", raw, off + 128, txnid)
        if root is not None:
            struct.pack_into("<Q", raw, off + 72 + 40, root)
        if entries is not None:
            struct.pack_into("<Q", raw, off + 72 + 32, entries)

    # as written: meta 1 live (txnid 1).  Make meta 0 the live one,
    # pointing at an EMPTY tree (simulates a later commit that deleted
    # everything): the reader must see zero records.
    patch_meta(0, txnid=2, root=P_INVALID, entries=0)
    data.write_bytes(bytes(raw))
    r = MiniLmdbReader(data)
    assert list(r.items()) == []
    r.close()

    # flip it stale again (txnid 0): meta 1 wins and the records are back
    patch_meta(0, txnid=0)
    data.write_bytes(bytes(raw))
    r = MiniLmdbReader(data)
    assert {k: bytes(v) for k, v in r.items()} == records
    r.close()


def _page_units(raw):
    """Split a data file into its page units: metas, single pages, and
    overflow chains (which must stay contiguous)."""
    n_pages = len(raw) // PAGE
    units = []
    pg = 2
    while pg < n_pages:
        off = pg * PAGE
        flags, = struct.unpack_from("<H", raw, off + 10)
        if flags & P_OVERFLOW:
            n, = struct.unpack_from("<I", raw, off + 12)
            units.append((pg, n))
            pg += n
        else:
            units.append((pg, 1))
            pg += 1
    return units


def test_fragmented_page_order(tmp_path):
    """Real incrementally-written LMDB files have pages in allocation
    order, not key order.  Permute the page units of a well-formed file
    (reversing them), rewrite every pointer (mp_pgno, branch children,
    BIGDATA overflow refs, meta root), and require identical records."""
    rng = np.random.default_rng(3)
    records = {}
    for i in range(120):
        size = [10, 500, NODEMAX + 100, 2 * PAGE + 7][i % 4]
        records[f"frag-{i:04d}".encode()] = bytes(
            rng.integers(0, 256, size, dtype=np.uint8))
    data = write_lmdb(tmp_path / "frag", records)
    raw = bytearray(data.read_bytes())

    units = _page_units(raw)
    new_first = {}
    pos = 2
    for first, n in reversed(units):
        new_first[first] = pos
        pos += n

    out = bytearray(len(raw))
    out[0:2 * PAGE] = raw[0:2 * PAGE]
    for first, n in units:
        dst = new_first[first]
        out[dst * PAGE:(dst + n) * PAGE] = raw[first * PAGE:(first + n) * PAGE]

    def remap(pgno):
        return new_first[pgno]

    # fix headers + node pointers in the relocated pages.  NOTE: only a
    # chain's FIRST page carries a header — interior overflow pages are
    # raw value bytes (mdb.c OVPAGES layout)
    for first, n in units:
        base = new_first[first] * PAGE
        struct.pack_into("<Q", out, base, new_first[first])
        flags, = struct.unpack_from("<H", out, base + 10)
        if flags & P_OVERFLOW:
            continue
        lower, = struct.unpack_from("<H", out, base + 12)
        n_nodes = (lower - HDR) >> 1
        for i in range(n_nodes):
            ptr, = struct.unpack_from("<H", out, base + HDR + 2 * i)
            node = base + ptr
            lo, hi, nflags, ksize = struct.unpack_from("<HHHH", out, node)
            if flags & P_BRANCH:
                child = lo | (hi << 16) | (nflags << 32)
                child = remap(child)
                struct.pack_into("<HHH", out, node, child & 0xFFFF,
                                 (child >> 16) & 0xFFFF,
                                 (child >> 32) & 0xFFFF)
            elif nflags & F_BIGDATA:
                ov, = struct.unpack_from("<Q", out, node + 8 + ksize)
                struct.pack_into("<Q", out, node + 8 + ksize, remap(ov))

    # metas: remap the root
    for pgno in (0, 1):
        off = pgno * PAGE + HDR
        root, = struct.unpack_from("<Q", out, off + 72 + 40)
        if root != P_INVALID:
            struct.pack_into("<Q", out, off + 72 + 40, remap(root))

    frag = tmp_path / "frag2.mdb"
    frag.write_bytes(bytes(out))
    r = MiniLmdbReader(frag)
    got = {k: bytes(v) for k, v in r.items()}
    assert got == records
    r.close()


@pytest.mark.parametrize("seed", range(5))
def test_lmdb_fuzz_round_trip(tmp_path, seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 400))
    records = {}
    for _ in range(n):
        klen = int(rng.integers(1, 60))
        key = bytes(rng.integers(0, 256, klen, dtype=np.uint8))
        vlen = int(rng.choice([0, 3, 200, 1900, 2100, 5000, 13000]))
        records[key] = bytes(rng.integers(0, 256, vlen, dtype=np.uint8))
    write_lmdb(tmp_path / f"fz{seed}", records)
    r = MiniLmdbReader(tmp_path / f"fz{seed}")
    got = {k: bytes(v) for k, v in r.items()}
    assert got == records
    assert r.stat()["entries"] == len(records)
    r.close()
