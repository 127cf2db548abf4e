#!/usr/bin/env python3
"""Generate native-format .ht/.mt test fixtures for the HailNative reader.

Independent (stdlib-only) implementation of the reference's on-disk
format, written from the public sources' documented layout:
  - metadata.json.gz component specs (AbstractTableSpec.scala,
    MatrixWriter.scala component rel_paths)
  - OrderedRVDSpec2 + TypedCodecSpec metadata (AbstractRVDSpec.scala)
  - blockedUncompressed buffer spec: BlockingBufferSpec(32768,
    StreamBlockBufferSpec2) — varint block length framing
    (BufferSpecs.scala:31, InputBuffers.scala StreamBlockInputBuffer2)
  - value encodings (types/encoded/*.scala): EBaseStruct packed missing
    bits (bit=1 missing), EArray2 varint length + missing bits,
    EBinary2 varint length + bytes, EVarint base-128, EFloat64 LE,
    part-file row framing [0x01 row]* 0x00
The committed fixtures are decoded by HailNativeSpec and the ht_import
gate; expected values are literal constants there.
"""
import gzip
import json
import os
import shutil
import struct
import sys


def varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class Enc:
    def __init__(self):
        self.buf = bytearray()

    def byte(self, b):
        self.buf.append(b)

    def vint(self, n):
        self.buf += varint(n)

    def f64(self, x):
        self.buf += struct.pack("<d", x)

    def i32(self, x):
        self.buf += struct.pack("<i", x)

    def binary(self, s):
        if isinstance(s, str):
            s = s.encode()
        self.vint(len(s))
        self.buf += s

    def missing_bits(self, flags):
        """flags: list of bools (True = missing), packed LSB-first."""
        nbytes = (len(flags) + 7) // 8
        arr = bytearray(nbytes)
        for i, f in enumerate(flags):
            if f:
                arr[i >> 3] |= 1 << (i & 7)
        self.buf += bytes(arr)


def frame_blocks(payload, block_size=32768):
    """StreamBlockBufferSpec2 framing: varint length per block."""
    out = bytearray()
    for off in range(0, len(payload), block_size):
        chunk = payload[off:off + block_size]
        out += varint(len(chunk))
        out += chunk
    if not payload:
        out += varint(0)
    return bytes(out)


BUFFER_SPEC = {
    "name": "BlockingBufferSpec",
    "blockSize": 32768,
    "child": {"name": "StreamBlockBufferSpec2"},
}


def write_rvd(dirpath, etype, vtype, key, parts):
    """parts: list of callables Enc -> None (one per part, encodes rows)."""
    os.makedirs(os.path.join(dirpath, "parts"), exist_ok=True)
    part_files = []
    for i, encode_rows in enumerate(parts):
        name = f"part-{i}"
        part_files.append(name)
        e = Enc()
        encode_rows(e)
        e.byte(0)  # end of stream
        with open(os.path.join(dirpath, "parts", name), "wb") as f:
            f.write(frame_blocks(bytes(e.buf)))
    meta = {
        "name": "OrderedRVDSpec2",
        "_key": key,
        "_codecSpec": {
            "name": "TypedCodecSpec",
            "_eType": etype,
            "_vType": vtype,
            "_bufferSpec": BUFFER_SPEC,
        },
        "_partFiles": part_files,
        "_jRangeBounds": [None for _ in parts],
        "_attrs": {},
    }
    with gzip.open(os.path.join(dirpath, "metadata.json.gz"), "wt") as f:
        json.dump(meta, f)


def write_table(path):
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)

    row_v = ("Struct{id:Int32,name:String,score:Float64,"
             "tags:Array[String],info:Struct{a:Int32,b:Boolean},"
             "maybe:Float64}")
    row_e = ("+EBaseStruct{id:+EVarint,name:+EBinary2,score:+EFloat64,"
             "tags:+EArray2[EBinary2],info:+EBaseStruct{a:EVarint,"
             "b:+EBoolean},maybe:EFloat64}")
    glob_v = "Struct{pop:String,version:Int32}"
    glob_e = "+EBaseStruct{pop:+EBinary2,version:+EVarint}"

    def row(e, rid, name, score, tags, a, b, maybe):
        e.byte(1)
        # top-level struct: optional fields = [maybe] -> 1 missing byte
        e.missing_bits([maybe is None])
        e.vint(rid)
        e.binary(name)
        e.f64(score)
        e.vint(len(tags))
        e.missing_bits([t is None for t in tags])
        for t in tags:
            if t is not None:
                e.binary(t)
        # info struct: optional fields = [a]
        e.missing_bits([a is None])
        if a is not None:
            e.vint(a)
        e.byte(1 if b else 0)
        if maybe is not None:
            e.f64(maybe)

    def part0(e):
        row(e, 1, "alpha", 1.5, ["x", "y"], 10, True, 2.25)
        row(e, 2, "beta", -3.0, [], None, False, None)
        row(e, 3, "gamma", 0.125, ["z", None, "w"], 7, True, -1.0)

    def part1(e):
        row(e, 4, "delta", 4.5, ["q"], 0, False, 0.5)
        row(e, 5, "epsilon", 9.0, [None], 128, True, None)

    write_rvd(os.path.join(path, "rows"), row_e, row_v, ["id"],
              [part0, part1])

    def globals_part(e):
        e.byte(1)
        e.missing_bits([])
        e.binary("EUR")
        e.vint(42)

    write_rvd(os.path.join(path, "globals"), glob_e, glob_v, [],
              [globals_part])

    table_type = (f"Table{{global:{glob_v},key:[id],row:{row_v}}}")
    meta = {
        "name": "TableSpec",
        "file_version": (1 << 16) | (8 << 8),  # 1.8.0
        "hail_version": "0.2-fixture",
        "references_rel_path": "references",
        "table_type": table_type,
        "components": {
            "globals": {"name": "RVDComponentSpec", "rel_path": "globals"},
            "rows": {"name": "RVDComponentSpec", "rel_path": "rows"},
            "partition_counts": {"name": "PartitionCountsComponentSpec",
                                 "counts": [3, 2]},
        },
    }
    with gzip.open(os.path.join(path, "metadata.json.gz"), "wt") as f:
        json.dump(meta, f)


def frame_blocks_v1(payload, block_size=32768):
    """StreamBlockBufferSpec (v1) framing: 4-byte LE length per block."""
    out = bytearray()
    for off in range(0, len(payload), block_size):
        chunk = payload[off:off + block_size]
        out += struct.pack("<i", len(chunk))
        out += chunk
    if not payload:
        out += struct.pack("<i", 0)
    return bytes(out)


def write_table_legacy(path):
    """v1-style encodings: LEB128 buffer wrapper (fixed-width int reads
    become varints), legacy EArray/EBinary (readInt lengths -> varint
    under LEB128), EInt32/EInt64 (-> varint under LEB128), 4-byte block
    framing. Exercises the compatibility matrix the default fixture
    doesn't."""
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    row_v = ("Struct{id:Int32,name:String,score:Float64,"
             "tags:Array[String],big:Int64}")
    row_e = ("+EBaseStruct{id:+EInt32,name:+EBinary,score:+EFloat64,"
             "tags:+EArray[EBinary],big:EInt64}")
    glob_v = "Struct{tag:String}"
    glob_e = "+EBaseStruct{tag:+EBinary}"
    buffer_spec = {
        "name": "LEB128BufferSpec",
        "child": {
            "name": "BlockingBufferSpec",
            "blockSize": 32768,
            "child": {"name": "StreamBlockBufferSpec"},
        },
    }

    def vint32(e, n):
        e.buf += varint(n & 0xFFFFFFFF)

    def vint64(e, n):
        e.buf += varint(n & 0xFFFFFFFFFFFFFFFF)

    def row(e, rid, name, score, tags, big):
        e.byte(1)
        e.missing_bits([big is None])
        vint32(e, rid)
        vint32(e, len(name.encode()))
        e.buf += name.encode()
        e.f64(score)
        vint32(e, len(tags))
        e.missing_bits([t is None for t in tags])
        for t in tags:
            if t is not None:
                vint32(e, len(t.encode()))
                e.buf += t.encode()
        if big is not None:
            vint64(e, big)

    def part0(e):
        row(e, -7, "neg", -0.5, ["a", None], -1234567890123)
        row(e, 300, "big", 2.0, [], 2 ** 40)

    def globals_part(e):
        e.byte(1)
        e.missing_bits([])
        vint32(e, len(b"legacy"))
        e.buf += b"legacy"

    # inline write_rvd with the legacy framing + buffer spec
    for sub, etype, vtype, key, enc in [
            ("rows", row_e, row_v, ["id"], part0),
            ("globals", glob_e, glob_v, [], globals_part)]:
        d = os.path.join(path, sub)
        os.makedirs(os.path.join(d, "parts"), exist_ok=True)
        e = Enc()
        enc(e)
        e.byte(0)
        with open(os.path.join(d, "parts", "part-0"), "wb") as f:
            f.write(frame_blocks_v1(bytes(e.buf)))
        meta = {
            "name": "OrderedRVDSpec2",
            "_key": key,
            "_codecSpec": {
                "name": "TypedCodecSpec",
                "_eType": etype,
                "_vType": vtype,
                "_bufferSpec": buffer_spec,
            },
            "_partFiles": ["part-0"],
            "_jRangeBounds": [None],
            "_attrs": {},
        }
        with gzip.open(os.path.join(d, "metadata.json.gz"), "wt") as f:
            json.dump(meta, f)
    meta = {
        "name": "TableSpec",
        "file_version": (1 << 16) | (6 << 8),  # 1.6.0
        "hail_version": "0.2-fixture-legacy",
        "references_rel_path": "references",
        "table_type": f"Table{{global:{glob_v},key:[id],row:{row_v}}}",
        "components": {
            "globals": {"name": "RVDComponentSpec", "rel_path": "globals"},
            "rows": {"name": "RVDComponentSpec", "rel_path": "rows"},
            "partition_counts": {"name": "PartitionCountsComponentSpec",
                                 "counts": [2]},
        },
    }
    with gzip.open(os.path.join(path, "metadata.json.gz"), "wt") as f:
        json.dump(meta, f)


ENTRIES_FIELD = "the entries! [877f12a8827e18f61222c6c8c5fb04a8]"


def write_matrix(path):
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)

    row_v = "Struct{locus:Locus(GRCh38),ref:String}"
    row_e = ("+EBaseStruct{locus:+EBaseStruct{contig:+EBinary2,"
             "position:+EVarint},ref:+EBinary2}")
    entry_v = (f"Struct{{`{ENTRIES_FIELD}`:"
               "Array[Struct{gt:Int32,dp:Int32}]}")
    # array element struct is OPTIONAL (no +): filtered entries surface
    # as missing elements, so presence bits precede the structs
    entry_e = (f"+EBaseStruct{{`{ENTRIES_FIELD}`:"
               "+EArray2[EBaseStruct{gt:EVarint,dp:EVarint}]}")
    col_v = "Struct{s:String}"
    col_e = "+EBaseStruct{s:+EBinary2}"
    glob_v = "Struct{note:String}"
    glob_e = "+EBaseStruct{note:+EBinary2}"

    variants = [("chr1", 100, "A", [(0, 10), (1, None)]),
                ("chr1", 200, "C", [(None, 5), (2, 20)]),
                ("chr2", 300, "G", [(1, 7), (0, 8)])]

    def rows_part(e):
        for contig, pos, ref, _ in variants:
            e.byte(1)
            e.missing_bits([])  # no optional top-level fields
            e.missing_bits([])  # locus struct: all required
            e.binary(contig)
            e.vint(pos)
            e.binary(ref)

    def entries_part(e):
        for _, _, _, ents in variants:
            e.byte(1)
            e.missing_bits([])  # single required field
            e.vint(len(ents))
            e.missing_bits([False] * len(ents))  # entry structs present
            for gt, dp in ents:
                e.missing_bits([gt is None, dp is None])
                if gt is not None:
                    e.vint(gt)
                if dp is not None:
                    e.vint(dp)

    def cols_part(e):
        for s in ["S1", "S2"]:
            e.byte(1)
            e.missing_bits([])
            e.binary(s)

    def globals_part(e):
        e.byte(1)
        e.missing_bits([])
        e.binary("fixture")

    write_rvd(os.path.join(path, "rows", "rows"), row_e, row_v,
              ["locus"], [rows_part])
    write_rvd(os.path.join(path, "entries", "rows"), entry_e, entry_v,
              [], [entries_part])
    write_rvd(os.path.join(path, "cols", "rows"), col_e, col_v, ["s"],
              [cols_part])
    write_rvd(os.path.join(path, "globals", "rows"), glob_e, glob_v, [],
              [globals_part])

    matrix_type = (f"Matrix{{global:{glob_v},col_key:[s],col:{col_v},"
                   f"row_key:[[locus]],row:{row_v},"
                   "entry:Struct{gt:Int32,dp:Int32}}")
    meta = {
        "name": "MatrixTableSpec",
        "file_version": (1 << 16) | (8 << 8),  # 1.8.0
        "hail_version": "0.2-fixture",
        "references_rel_path": "references",
        "matrix_type": matrix_type,
        "components": {
            "globals": {"name": "RVDComponentSpec",
                        "rel_path": "globals/rows"},
            "cols": {"name": "RVDComponentSpec", "rel_path": "cols/rows"},
            "rows": {"name": "RVDComponentSpec", "rel_path": "rows/rows"},
            "entries": {"name": "RVDComponentSpec",
                        "rel_path": "entries/rows"},
            "partition_counts": {"name": "PartitionCountsComponentSpec",
                                 "counts": [3]},
        },
    }
    with gzip.open(os.path.join(path, "metadata.json.gz"), "wt") as f:
        json.dump(meta, f)


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/src/test/resources"
    write_table(os.path.join(base, "sample.ht"))
    write_table_legacy(os.path.join(base, "sample_legacy.ht"))
    write_matrix(os.path.join(base, "sample.mt"))
    print("wrote", os.path.join(base, "sample.ht"),
          "sample_legacy.ht and sample.mt")
