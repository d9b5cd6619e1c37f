"""Interop fixtures: the CRAM/BAI readers decode files they did NOT write.

htslib/samtools binaries are not available in this sandbox (zero egress),
so instead of checked-in samtools outputs these tests carry INDEPENDENT
encoders written directly from the specs (CRAM 3.0 spec §8-10, SAM spec
§5.2) inside the test module — deliberately producing layouts the
package's own writers never emit:

* CRAM: one container holding TWO slices; HUFFMAN (real tree) + BETA core
  codecs; AP-delta positions; no read names (RN=0); a NON-default
  substitution matrix; an embedded-reference slice; non-detached records;
  order-1 rANS quality block.
* BAI: per-record chunks (never merged), full linear index, and the
  samtools metadata pseudo-bin 37450 — shapes build_bai never produces.

The one reuse from the package is rans4x8_encode_1 (the order-1 encoder),
whose byte format is itself locked by round-trip tests.
"""
import struct
import zlib

import numpy as np
import pytest

from locityper_tpu.seq import bai, bam, crai
from locityper_tpu.seq import dna
from locityper_tpu.seq.cram import rans4x8_encode_1, read_cram_records


# ---------------------------------------------------------------------------
# Test-side primitives (spec-derived; independent of seq/cram.py helpers)
# ---------------------------------------------------------------------------

def itf8(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF,
                      v & 0xFF])
    return bytes([0xF0 | (v >> 28), (v >> 24) & 0xFF, (v >> 16) & 0xFF,
                  (v >> 8) & 0xFF, v & 0xF])


def ltf8(v: int) -> bytes:
    assert 0 <= v < 0x80
    return bytes([v])


def arr(vals) -> bytes:
    return itf8(len(vals)) + b"".join(itf8(v) for v in vals)


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        bits = self.bits + [0] * (-len(self.bits) % 8)
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


def block(method: int, ctype: int, cid: int, raw: bytes,
          blob: bytes | None = None) -> bytes:
    if blob is None:
        blob = raw
    head = bytes([method, ctype]) + itf8(cid) + itf8(len(blob)) \
        + itf8(len(raw))
    body = head + blob
    return body + struct.pack("<I", zlib.crc32(body))


def container(ref_id: int, start: int, span: int, n_rec: int, counter: int,
              blocks: list[bytes]) -> bytes:
    body = b"".join(blocks)
    head = (itf8(ref_id) + itf8(start) + itf8(span) + itf8(n_rec)
            + ltf8(counter) + ltf8(0) + itf8(len(blocks)) + arr([0]))
    head_full = struct.pack("<i", len(body)) + head
    head_full += struct.pack("<I", zlib.crc32(head_full))
    return head_full + body


# Non-default substitution matrix: for every ref base the 4 alternates
# (numeric order) get codes 3,2,1,0 — the REVERSE of the 0x1B default.
SM = b"\xe4" * 5


def bs_code(ref_code: int, alt_code: int) -> int:
    alts = [b for b in range(5) if b != ref_code]
    return [3, 2, 1, 0][alts.index(alt_code)]


def compression_header() -> bytes:
    pres_entries = [(b"RN", bytes([0])), (b"AP", bytes([1])),
                    (b"RR", bytes([1])), (b"SM", SM),
                    (b"TD", itf8(1) + b"\x00")]
    pres = itf8(len(pres_entries)) + b"".join(k + v
                                              for k, v in pres_entries)

    def ext(key, cid):
        params = itf8(cid)
        return key + itf8(1) + itf8(len(params)) + params

    series = [
        # HUFFMAN over flags {0, 16}, both 1-bit codes (canonical: 0->0,
        # 16->1) — a REAL tree, not the 0-bit constant shortcut.
        b"BF" + itf8(3) + itf8(len(arr([0, 16]) + arr([1, 1])))
        + arr([0, 16]) + arr([1, 1]),
        ext(b"CF", 2), ext(b"RL", 3), ext(b"AP", 4), ext(b"FN", 10),
        ext(b"FC", 11), ext(b"FP", 12), ext(b"BS", 13), ext(b"DL", 15),
        ext(b"QS", 18),
        # BYTE_ARRAY_STOP for insertions / soft clips.
        b"IN" + itf8(5) + itf8(len(bytes([0]) + itf8(14)))
        + bytes([0]) + itf8(14),
        b"SC" + itf8(5) + itf8(len(bytes([0]) + itf8(16)))
        + bytes([0]) + itf8(16),
        # BETA for MQ: 7 raw bits, offset 0.
        b"MQ" + itf8(6) + itf8(len(itf8(0) + itf8(7))) + itf8(0) + itf8(7),
    ]
    ser = itf8(len(series)) + b"".join(series)
    raw = (itf8(len(pres)) + pres + itf8(len(ser)) + ser
           + itf8(2) + itf8(0))
    return block(0, 1, 0, raw)                   # raw COMPRESSION_HEADER


def slice_blocks(s_ref: int, s_start: int, s_span: int, records: list,
                 counter: int, embedded_ref: np.ndarray | None) -> list:
    """records: (ap1, flag, rl, mq, quals, features) with features
    ('X', read_pos0, alt_code_vs_ref) / ('D', read_pos0, length) /
    ('S', read_pos0, codes) — encoded with AP deltas, no names."""
    streams = {k: bytearray() for k in
               ("CF", "RL", "AP", "FN", "FC", "FP", "BS", "DL", "IN", "SC",
                "QS")}
    core = BitWriter()
    last_ap = s_start
    for ap, flag, rl, mq, quals, feats, ref_codes in records:
        core.write(0 if flag == 0 else 1, 1)     # BF huffman
        streams["CF"] += itf8(1)                 # CF_QUALS, not detached
        streams["RL"] += itf8(rl)
        streams["AP"] += itf8(ap - last_ap)
        last_ap = ap
        streams["FN"] += itf8(len(feats))
        prev_fp = 0
        for fc, rp0, payload in feats:
            fp = rp0 + 1
            streams["FC"] += itf8(ord(fc))
            streams["FP"] += itf8(fp - prev_fp)
            prev_fp = fp
            if fc == "X":
                rpos_ref = ap - 1 + rp0          # no I/D before X in tests
                streams["BS"] += itf8(bs_code(int(ref_codes[rpos_ref]),
                                              payload))
            elif fc == "D":
                streams["DL"] += itf8(payload)
            elif fc == "S":
                streams["SC"] += dna.decode(payload).encode() + b"\x00"
            else:
                raise AssertionError(fc)
        core.write(mq, 7)                        # MQ beta
        streams["QS"] += bytes(quals)

    ids = {"CF": 2, "RL": 3, "AP": 4, "FN": 10, "FC": 11, "FP": 12,
           "BS": 13, "DL": 15, "IN": 14, "SC": 16, "QS": 18}
    used = [k for k in ids if streams[k]]
    content_ids = [ids[k] for k in used]
    emb_id = -1
    blocks = []
    if embedded_ref is not None:
        emb_id = 30
        content_ids = content_ids + [emb_id]
    sh = (itf8(s_ref) + itf8(s_start) + itf8(s_span) + itf8(len(records))
          + ltf8(counter) + itf8(1 + len(content_ids)) + arr(content_ids)
          + itf8(emb_id) + b"\x00" * 16)
    blocks.append(block(0, 2, 0, sh))            # SLICE_HEADER
    blocks.append(block(0, 5, 0, core.bytes()))  # CORE
    for k in used:
        raw = bytes(streams[k])
        if k == "QS":
            blocks.append(block(4, 4, ids[k], raw,
                                blob=rans4x8_encode_1(raw)))
        elif k == "AP":
            import gzip as _gz
            blocks.append(block(1, 4, ids[k], raw, blob=_gz.compress(raw)))
        else:
            blocks.append(block(0, 4, ids[k], raw))
    if embedded_ref is not None:
        blocks.append(block(0, 4, emb_id,
                            dna.decode(embedded_ref).encode()))
    return blocks


@pytest.fixture
def foreign_cram(tmp_path):
    rng = np.random.default_rng(99)
    ref = rng.integers(0, 4, 1000).astype(np.int8)
    # slice 1 (reference from the fasta map): 3 records at 1-based 101/111/131
    r1 = [
        (101, 0, 20, 30, bytes(range(40, 60)), [], ref),
        (111, 0, 20, 31, bytes(range(60, 80)),
         [("X", 5, int((ref[110 + 5] + 2) % 4))], ref),
        (131, 16, 20, 32, bytes(range(10, 30)), [("D", 10, 2)], ref),
    ]
    # slice 2 (embedded reference): starts at 1-based 301
    emb = ref[300:400]
    r2 = [
        (301, 0, 20, 33, bytes(range(70, 90)), [], ref),
        (305, 0, 20, 34, bytes(range(30, 50)),
         [("S", 15, np.array([0, 1, 2, 3, 0], np.int8))], ref),
        (310, 16, 20, 35, bytes(range(90, 110)), [], ref),
    ]
    path = tmp_path / "foreign.cram"
    header = "@HD\tVN:1.6\n@SQ\tSN:c1\tLN:1000\n"
    hraw = struct.pack("<i", len(header)) + header.encode()
    data = b"CRAM" + bytes([3, 0]) + b"\x00" * 20
    data += container(-1, 0, 0, 0, 0, [block(0, 0, 0, hraw)])
    blocks = [compression_header()]
    blocks += slice_blocks(0, 101, 229, r1, 0, None)
    blocks += slice_blocks(0, 301, 29, r2, 3, emb)
    data += container(0, 101, 229, 6, 0, blocks)
    # EOF container (spec §9 sentinel).
    eof_blk = block(0, 1, 0, itf8(0) * 6)
    data += container(-1, 4542278, 0, 0, 0, [eof_blk])
    path.write_bytes(data)
    return path, ref, (r1, r2)


class TestForeignCram:
    def _expected_seq(self, ref, ap, rl, flag, feats):
        pos0 = ap - 1
        out, fpos, rpos = [], 0, pos0
        for fc, rp0, payload in feats:
            out.append(ref[rpos:rpos + (rp0 - fpos)])
            rpos += rp0 - fpos
            fpos = rp0
            if fc == "X":
                out.append(np.array([payload], np.int8))
                fpos += 1
                rpos += 1
            elif fc == "D":
                rpos += payload
            elif fc == "S":
                out.append(payload)
                fpos += len(payload)
        out.append(ref[rpos:rpos + (rl - fpos)])
        seq = np.concatenate(out).astype(np.int8)
        return dna.revcomp(seq) if flag & 16 else seq

    def test_decodes_all_records(self, foreign_cram):
        path, ref, (r1, r2) = foreign_cram
        recs = list(read_cram_records(path, reference={"c1": ref}))
        assert [r.name for r in recs] == [f"cram.{i}" for i in range(6)]
        for rec, (ap, flag, rl, mq, quals, feats, _) in zip(recs, r1 + r2):
            assert rec.flag == flag and rec.mapq == mq
            assert rec.pos == ap - 1
            np.testing.assert_array_equal(
                rec.seq, self._expected_seq(ref, ap, rl, flag, feats),
                err_msg=rec.name)
            want_q = np.frombuffer(quals, np.uint8)
            got_q = rec.qual[::-1] if flag & 16 else rec.qual
            np.testing.assert_array_equal(got_q, want_q)

    def test_non_default_substitution_matrix(self, foreign_cram):
        path, ref, (r1, _) = foreign_cram
        recs = list(read_cram_records(path, reference={"c1": ref}))
        ap, _, _, _, _, feats, _ = r1[1]
        alt = feats[0][2]
        assert recs[1].seq[5] == alt != ref[ap - 1 + 5]

    def test_crai_fetch_on_foreign_file(self, foreign_cram):
        path, ref, (r1, r2) = foreign_cram
        idx = crai.build_crai(path)
        got = sorted(r.name for r in
                     crai.fetch(path, idx, 0, 100, 140, reference={"c1": ref}))
        assert got == ["cram.0", "cram.1", "cram.2"]


# ---------------------------------------------------------------------------
# Foreign BAI: per-record chunks + pseudo-bin metadata (samtools layout)
# ---------------------------------------------------------------------------

def sam_reg2bin(beg: int, end: int) -> int:
    """SAM spec §5.3 reference implementation (independent of seq/bai.py)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def test_foreign_bai_fetch(tmp_path):
    rng = np.random.default_rng(17)
    path = tmp_path / "s.bam"
    poss = np.sort(rng.integers(0, 500_000, 800))
    with bam.BamWriter(path, ["c1"], [600_000]) as w:
        for i, p in enumerate(poss):
            w.write(f"r{i}", 0, rng.integers(0, 4, 120).astype(np.int8),
                    ref_id=0, pos=int(p))
        for i in range(7):
            w.write(f"un{i}", bam.FLAG_UNMAPPED,
                    rng.integers(0, 4, 120).astype(np.int8))

    # Locate every record's virtual offsets with the BGZF reader, then
    # build the index with samtools' layout: one chunk PER RECORD (the
    # package builder merges adjacent chunks), a full linear index, and
    # the metadata pseudo-bin 37450.
    spans = []                                   # (v0, v1, pos, end)
    un_start = None
    with open(path, "rb") as fh:
        vr = bai.VirtualReader(fh)
        bai.read_header(vr)
        while True:
            v0 = vr.voffset
            head = vr.read(4)
            if len(head) < 4:
                break
            (sz,) = struct.unpack("<i", head)
            rec = vr.read(sz)
            v1 = vr.voffset
            ref_id, pos = struct.unpack_from("<ii", rec, 0)
            if ref_id < 0:
                if un_start is None:
                    un_start = v0
                continue
            spans.append((v0, v1, pos, pos + 120))

    bins: dict = {}
    n_lin = ((600_000 - 1) >> 14) + 1
    linear = [0] * n_lin
    seen = [False] * n_lin
    for v0, v1, pos, end in spans:
        bins.setdefault(sam_reg2bin(pos, end), []).append((v0, v1))
        for w_ in range(pos >> 14, ((end - 1) >> 14) + 1):
            if not seen[w_]:
                linear[w_] = v0
                seen[w_] = True
    # fill gaps with the previous window's offset, as samtools does
    last = 0
    for i in range(n_lin):
        if seen[i]:
            last = linear[i]
        else:
            linear[i] = last
    # metadata pseudo-bin: [(ref_beg, ref_end), (n_mapped, n_unmapped)]
    bins[37450] = [(spans[0][0], un_start), (len(spans), 7)]

    out = bytearray(b"BAI\x01" + struct.pack("<i", 1))
    out += struct.pack("<i", len(bins))
    for b in bins:                               # deliberately unsorted
        out += struct.pack("<Ii", b, len(bins[b]))
        for cb, ce in bins[b]:
            out += struct.pack("<QQ", cb, ce)
    out += struct.pack("<i", n_lin)
    out += struct.pack(f"<{n_lin}Q", *linear)
    out += struct.pack("<Q", 7)
    (tmp_path / "s.bam.bai").write_bytes(bytes(out))

    idx = bai.BaiIndex.load(tmp_path / "s.bam.bai")
    assert idx.n_no_coor == 7
    for beg, end in ((0, 10_000), (123_456, 130_000), (480_000, 600_000)):
        want = sorted(f"r{i}" for i, p in enumerate(poss)
                      if p < end and p + 120 > beg)
        got = sorted(r.name for r in bai.fetch(path, idx, 0, beg, end))
        assert got == want, (beg, end)
    un = sorted(r.name for r in bai.fetch_unplaced(path, idx))
    assert un == sorted(f"un{i}" for i in range(7))
