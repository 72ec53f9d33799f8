#!/usr/bin/env python3
"""Generate .mpf test fixtures with an INDEPENDENT pure-stdlib proto3
encoder (the sandbox has no protobuf package), following the public wire
format for the reference's MPFOutput schema
(reference io/protobuf/proto_messages.proto:9-111). The reference's own
to_mpf is protobuf's canonical serializer: fields in field-number order,
packed repeated scalars, proto3 default-zero omission — which is exactly
what this encoder emits, so the fixture bytes match what the reference
writes for the same profile. The Scala-side Mpf codec (graft.io.Mpf) is
a SEPARATE implementation; MpfSpec decodes these bytes and also pins its
own serializer byte-for-byte against them.

Deterministic content: a splitmix64-derived series (same generator family
as the engine's test data), mirroring the MP/PMP cases of the reference's
tests/test_io.py:73-128.
"""
import struct
import os

MASK = (1 << 64) - 1


def splitmix64(x):
    x = (x + 0x9E3779B97F4A7C15) & MASK
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return z ^ (z >> 31)


def varint(v):
    out = b""
    while v > 0x7F:
        out += bytes([(v & 0x7F) | 0x80])
        v >>= 7
    return out + bytes([v])


def tag(field, wire):
    return varint((field << 3) | wire)


def f_uint(field, v):
    return b"" if v == 0 else tag(field, 0) + varint(v)


def f_bool(field, v):
    return f_uint(field, 1 if v else 0)


def f_double(field, v):
    return b"" if v == 0.0 else tag(field, 1) + struct.pack("<d", v)


def f_str(field, s):
    bs = s.encode("utf-8")
    return b"" if not bs else tag(field, 2) + varint(len(bs)) + bs


def f_msg(field, payload):
    return tag(field, 2) + varint(len(payload)) + payload


def f_packed_doubles(field, vs):
    if not vs:
        return b""
    payload = b"".join(struct.pack("<d", v) for v in vs)
    return tag(field, 2) + varint(len(payload)) + payload


def f_packed_varints(field, vs):
    if not vs:
        return b""
    payload = b"".join(varint(v) for v in vs)
    return tag(field, 2) + varint(len(payload)) + payload


def dmatrix(rows, cols, data):
    return f_uint(1, rows) + f_uint(2, cols) + f_packed_doubles(3, data)


def imatrix(rows, cols, data):
    return f_uint(1, rows) + f_uint(2, cols) + f_packed_varints(3, data)


def location(row, col):
    return f_uint(1, row) + f_uint(2, col)


def series(n, seed):
    return [(splitmix64(seed + i) % 100000) / 10000.0 for i in range(n)]


def mp_fixture():
    n, w = 64, 8
    plen = n - w + 1
    ts = series(n, 11)
    mp = [(splitmix64(1000 + i) % 40000) / 10000.0 for i in range(plen)]
    pi = [splitmix64(2000 + i) % plen for i in range(plen)]
    lmp = [(splitmix64(3000 + i) % 40000) / 10000.0 for i in range(plen)]
    lpi = [splitmix64(4000 + i) % plen for i in range(plen)]
    av = [(splitmix64(5000 + i) % 10000) / 10000.0 for i in range(plen)]
    cmp_ = [m + 0.5 for m in mp]
    mpmsg = (f_msg(1, dmatrix(plen, 0, mp)) + f_msg(2, imatrix(plen, 0, pi))
             + f_msg(3, dmatrix(plen, 0, lmp)) + f_msg(4, imatrix(plen, 0, lpi))
             + f_uint(9, 2) + f_bool(10, False))
    motif = f_msg(1, location(3, 0)) + f_msg(1, location(17, 0)) \
        + f_msg(2, location(29, 0))
    out = (f_str(1, "MatrixProfile") + f_str(2, "mpx") + f_str(3, "euclidean")
           + f_double(4, 1.0) + f_packed_varints(5, [w])
           + f_msg(6, dmatrix(n, 0, ts))
           + f_msg(8, mpmsg)
           + f_msg(10, motif)
           + f_msg(11, location(9, 0)) + f_msg(11, location(41, 0))
           + f_msg(12, dmatrix(plen, 0, cmp_))
           + f_msg(13, dmatrix(plen, 0, av))
           + f_str(14, "complexity"))
    return out


def pmp_fixture():
    n = 64
    windows = [4, 6, 8]
    cols = n - min(windows) + 1  # reference pads PMP rows to a common width
    pmp, pmpi = [], []
    for r, w in enumerate(windows):
        pmp += [(splitmix64(7000 + 100 * r + i) % 40000) / 10000.0
                for i in range(cols)]
        pmpi += [splitmix64(8000 + 100 * r + i) % cols for i in range(cols)]
    ts = series(n, 13)
    pmpmsg = f_msg(1, dmatrix(len(windows), cols, pmp)) \
        + f_msg(2, imatrix(len(windows), cols, pmpi))
    out = (f_str(1, "PMP") + f_str(2, "skimp") + f_str(3, "pearson")
           + f_double(4, 1.0) + f_packed_varints(5, windows)
           + f_msg(6, dmatrix(n, 0, ts))
           + f_msg(9, pmpmsg))
    return out


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    ref = os.path.join(here, "..", "src", "test", "resources", "ref")
    with open(os.path.join(ref, "fixture_mp.mpf"), "wb") as f:
        f.write(mp_fixture())
    with open(os.path.join(ref, "fixture_pmp.mpf"), "wb") as f:
        f.write(pmp_fixture())
    print("wrote fixture_mp.mpf", len(mp_fixture()), "bytes;",
          "fixture_pmp.mpf", len(pmp_fixture()), "bytes")
