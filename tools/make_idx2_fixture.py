#!/usr/bin/env python3
"""Generate a reference-style BGEN `.idx2` index sidecar for the
committed oracle_bgen.bgen fixture, exercising the BgenIdx2 reader.

Independent implementation of the reference's index format, written from
the public sources' documented layout (io/bgen/BgenSettings.scala
getIndexSpec, io/index/IndexWriter.scala, IndexReader.scala):
  - a B-tree of nodes; each node is flushed as its own buffer frame at a
    recorded offset: tag byte (1 internal / 0 leaf) + one encoded row
  - v1.3 spec: blocked zstd (64 KiB, varint block framing =
    StreamBlockBufferSpec2, 4-byte LE uncompressed-length prefix inside
    the block), EVarint integers, EBinary2 strings, EArray2 arrays
  - leaf row: {first_idx, keys: [{key: {locus{contig, position},
    alleles}, offset, annotation: {}}]}; internal row: {children:
    [{index_file_offset, first_idx, first_key, first_record_offset,
    first_annotation}]}
  - metadata: dir form (metadata.json.gz beside `index`) and file form
    (json tail + trailing LE offset long, IndexReader
    .readInlineMetadataRaw)
The `offset` recorded per key is the variant RECORD start
(StagedBGENReader.scala:134 `getPosition` before the varid read).

Writes:
  src/test/resources/oracle_bgen.bgen.idx2/   (dir form; picked up by
                                               Bgen.read for the gate)
  src/test/resources/idx2_fileform.bin        (file form; spec copies it
                                               next to a temp bgen)

zstd via pyarrow (driver-side python), same codec family the JVM reader
decodes.
"""
import gzip
import json
import os
import shutil
import struct
import sys

import pyarrow as pa

HERE = os.path.dirname(os.path.abspath(__file__))
RES = os.path.join(HERE, "..", "src", "test", "resources")
BGEN = os.path.join(RES, "oracle_bgen.bgen")

FILE_VERSION = (1 << 16) | (3 << 8)  # 1.3.0
BRANCHING = 16


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


def walk_bgen(path):
    """(contig, position, alleles, record_start_offset) per variant."""
    with open(path, "rb") as f:
        data = f.read()
    (first_variant,) = struct.unpack_from("<I", data, 0)
    (lh, m, n) = struct.unpack_from("<III", data, 4)
    (flags,) = struct.unpack_from("<I", data, 4 + lh - 4)
    compression = flags & 3
    pos = first_variant + 4
    out = []
    for _ in range(m):
        start = pos
        (lid,) = struct.unpack_from("<H", data, pos); pos += 2 + lid
        (lrs,) = struct.unpack_from("<H", data, pos); pos += 2 + lrs
        (lchr,) = struct.unpack_from("<H", data, pos)
        chrom = data[pos + 2:pos + 2 + lchr].decode(); pos += 2 + lchr
        (vpos,) = struct.unpack_from("<I", data, pos); pos += 4
        (k,) = struct.unpack_from("<H", data, pos); pos += 2
        alleles = []
        for _ in range(k):
            (la,) = struct.unpack_from("<I", data, pos)
            alleles.append(data[pos + 4:pos + 4 + la].decode())
            pos += 4 + la
        (c,) = struct.unpack_from("<I", data, pos); pos += 4
        if compression != 0:
            pos += 4
            c -= 4
        pos += c
        out.append((chrom, vpos, alleles, start))
    assert pos == len(data), (pos, len(data))
    return n, out


class NodeEnc:
    """Raw (pre-framing) byte stream of one node."""

    def __init__(self):
        self.buf = bytearray()

    def byte(self, b):
        self.buf.append(b)

    def vint(self, n):
        self.buf += varint(n)

    def string(self, s):  # EBinary2
        b = s.encode()
        self.vint(len(b))
        self.buf += b

    def key(self, chrom, vpos, alleles):
        # key struct is OPTIONAL at its use sites -> callers emit the
        # presence bit; the struct itself: optional fields = [alleles]
        self.byte(0)              # alleles present
        # locus: required struct, no optional fields
        self.string(chrom)
        self.vint(vpos)
        self.vint(len(alleles))   # EArray2, optional elements
        self.buf += bytes((len(alleles) + 7) // 8)  # none missing
        for a in alleles:
            self.string(a)


def frame(node_bytes):
    """Blocked-zstd framing: varint(blockLen) + LE4(uncompLen) + zstd."""
    codec = pa.Codec("zstd")
    out = bytearray()
    for off in range(0, len(node_bytes), 65536):
        chunk = bytes(node_bytes[off:off + 65536])
        z = codec.compress(chunk, asbytes=True)
        out += varint(len(z) + 4)
        out += struct.pack("<I", len(chunk))
        out += z
    return bytes(out)


def build_index(variants):
    """Returns (index_payload_bytes, root_offset, height)."""
    payload = bytearray()
    leaves = []  # (offset, first_idx, first_key_tuple, first_record_offset)
    for i in range(0, len(variants), BRANCHING):
        group = variants[i:i + BRANCHING]
        e = NodeEnc()
        e.byte(0)                 # leaf tag
        # leaf struct: no optional fields
        e.vint(i)                 # first_idx
        e.vint(len(group))        # keys EArray2, required elements
        for (chrom, vpos, alleles, off) in group:
            # element struct: optional fields = [key]
            e.byte(0)             # key present
            e.key(chrom, vpos, alleles)
            e.vint(off)           # offset
            # annotation: required empty struct -> nothing
        leaves.append((len(payload), i, group[0], None))
        payload += frame(bytes(e.buf))
    e = NodeEnc()
    e.byte(1)                     # internal tag
    e.vint(len(leaves))           # children EArray2, required elements
    for (node_off, first_idx, first, _) in leaves:
        (chrom, vpos, alleles, rec_off) = first
        # child struct: optional fields = [first_key]
        e.byte(0)                 # first_key present
        e.vint(node_off)          # index_file_offset
        e.vint(first_idx)
        e.key(chrom, vpos, alleles)
        e.vint(rec_off)           # first_record_offset
        # first_annotation: required empty struct
    root = len(payload)
    payload += frame(bytes(e.buf))
    return bytes(payload), root, 2


def metadata(n_keys, root):
    return {
        "fileVersion": FILE_VERSION,
        "branchingFactor": BRANCHING,
        "height": 2,
        "keyType": "Struct{locus:Locus(GRCh37),alleles:Array[String]}",
        "annotationType": "Struct{}",
        "nKeys": n_keys,
        "indexPath": "index",
        "rootOffset": root,
        "attributes": {},
    }


def main():
    _, variants = walk_bgen(BGEN)
    payload, root, _ = build_index(variants)
    md = metadata(len(variants), root)

    # dir form
    d = BGEN + ".idx2"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    with open(os.path.join(d, "index"), "wb") as f:
        f.write(payload)
    with gzip.open(os.path.join(d, "metadata.json.gz"), "wt") as f:
        json.dump(md, f)

    # file form: payload ++ json ++ LE8(json offset)
    jb = json.dumps(md).encode()
    with open(os.path.join(RES, "idx2_fileform.bin"), "wb") as f:
        f.write(payload)
        f.write(jb)
        f.write(struct.pack("<q", len(payload)))

    print(f"wrote {d} ({len(variants)} keys, root@{root}) "
          f"and idx2_fileform.bin")


if __name__ == "__main__":
    main()
