"""paf-vcf full semantics (commands/paf_vcf.py vs paf_vcf.rs): variant-range
extraction with anchors and mismatch-indel merging, left-canonization,
multi-allelic merge, diploid sample grouping, region shift, discarded-twin
mapping, BGZF output."""
import gzip

import numpy as np
import pytest

from locityper_tpu import cli
from locityper_tpu.commands import paf_vcf as PV
from locityper_tpu.seq import dna, fastx


class TestVarRanges:
    def test_snv_and_del_with_anchor(self):
        vars_ = PV.process_haplotype("5=1X4=2D8=", 0, 0)
        assert [(v.ref_start, v.ref_end, v.hap_start, v.hap_end)
                for v in vars_] == [(5, 6, 5, 6), (9, 12, 9, 10)]

    def test_mismatch_merges_with_following_indel(self):
        # X at 5, then I directly after: one range (paf_vcf.rs:276-287).
        vars_ = PV.process_haplotype("5=1X2I8=", 0, 0)
        assert len(vars_) == 1
        v = vars_[0]
        assert (v.ref_start, v.ref_end, v.hap_start, v.hap_end) == (5, 6, 5, 8)

    def test_leading_indel_takes_right_anchor(self):
        vars_ = PV.process_haplotype("2D10=", 0, 0)
        v = vars_[0]
        assert (v.ref_start, v.ref_end) == (0, 3)

    def test_left_canonization(self):
        # ref AAAAATTTT, hap AAAATTTT: deletion of one A canonizes to pos 0.
        ref = dna.encode("AAAAATTTT")
        hap = dna.encode("AAAATTTT")
        vars_ = PV.process_haplotype("3=1D5=", 0, 0)   # del at rpos 3
        PV.move_all_left(vars_, ref, hap)
        assert vars_[0].ref_start == 0


class TestGrouping:
    def test_diploid_suffixes(self):
        g = PV.group_haplotypes(["HG002.1", "HG002.2", "HG003_1", "lone"])
        assert g == [("HG002", ["HG002.1", "HG002.2"]),
                     ("HG003", ["HG003_1", None]),
                     ("lone", ["lone"])]

    def test_bad_name_raises(self):
        with pytest.raises(ValueError):
            PV.group_haplotypes(["*bad"])


class TestRegion:
    def test_colon_region(self):
        assert PV.load_region("chr6:29942470-29945884") == ("chr6", 29942469)

    def test_bed_region(self, tmp_path):
        p = tmp_path / "r.bed"
        p.write_text("chr1\t1000\t2000\tL\n")
        assert PV.load_region(str(p)) == ("chr1", 1000)


@pytest.fixture
def world(tmp_path):
    """Reference hap + two diploid samples with known variants."""
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, 600).astype(np.int8)
    # s1.1: SNV at 100; s1.2: same SNV (homozygous); s2.1: 3-bp del at 200;
    # s2.2: identical to ref (will come from --discarded twin of ref? no —
    # aligned normally with empty CIGAR vars).
    def with_snv(seq):
        out = seq.copy()
        out[100] = (out[100] + 1) % 4
        return out
    haps = {
        "ref": ref,
        "s1.1": with_snv(ref),
        "s1.2": with_snv(ref),
        "s2.1": np.concatenate([ref[:200], ref[203:]]),
        "s2.2": ref.copy(),
    }
    fa = tmp_path / "haps.fa"
    with open(fa, "w") as f:
        for n, s in haps.items():
            fastx.write_fasta(f, n, s)
    # PAF rows vs ref with extended CIGARs.
    rows = [
        ("s1.1", 600, "100=1X499="),
        ("s1.2", 600, "100=1X499="),
        ("s2.1", 597, "200=3D397="),
        ("s2.2", 600, "600="),
    ]
    paf = tmp_path / "x.paf"
    with open(paf, "w") as f:
        for q, qlen, cg in rows:
            f.write(f"{q}\t{qlen}\t0\t{qlen}\t+\tref\t600\t0\t600\t"
                    f"{qlen}\t600\t60\tcg:Z:{cg}\n")
    return tmp_path, fa, paf, haps


class TestEndToEnd:
    def test_merged_vcf(self, world):
        tmp, fa, paf, haps = world
        out = tmp / "m.vcf"
        rc = cli.main(["paf-vcf", "-i", str(paf), "-f", str(fa),
                       "-r", "ref", "-o", str(out)])
        assert rc == 0
        recs = [l.split("\t") for l in open(out)
                if l.strip() and not l.startswith("#")]
        header = [l for l in open(out) if l.startswith("#CHROM")][0]
        assert header.rstrip().split("\t")[9:] == ["s1", "s2"]
        assert len(recs) == 2
        snv, dele = sorted(recs, key=lambda r: int(r[1]))
        assert snv[0] == "ref" and snv[1] == "101"
        assert snv[9] == "1|1" and snv[10].strip() == "0|0"
        assert int(dele[1]) <= 201 and len(dele[3]) - len(dele[4]) == 3
        assert dele[9] == "0|0" and dele[10].strip() == "1|0"

    def test_region_shift_and_bgzf(self, world):
        tmp, fa, paf, haps = world
        out = tmp / "m.vcf.gz"
        rc = cli.main(["paf-vcf", "-i", str(paf), "-f", str(fa),
                       "-r", "ref", "-o", str(out),
                       "--region", "chr6:1001-1600"])
        assert rc == 0
        with gzip.open(out, "rt") as f:
            recs = [l.split("\t") for l in f
                    if l.strip() and not l.startswith("#")]
        snv = min(recs, key=lambda r: int(r[1]))
        assert snv[0] == "chr6" and snv[1] == "1101"

    def test_separate_and_discarded(self, world):
        tmp, fa, paf, haps = world
        disc = tmp / "disc.txt"
        disc.write_text("s3.1\t=\ts1.1\ns3.2\t=\ts2.1\n")
        out = tmp / "m.vcf"
        sep = tmp / "s.vcf"
        rc = cli.main(["paf-vcf", "-i", str(paf), "-f", str(fa),
                       "-r", "ref", "-o", str(out), "--separate", str(sep),
                       "--discarded", str(disc)])
        assert rc == 0
        header = [l for l in open(out) if l.startswith("#CHROM")][0]
        assert header.rstrip().split("\t")[9:] == ["s1", "s2", "s3"]
        recs = {int(r[1]): r for r in
                (l.split("\t") for l in open(out)
                 if l.strip() and not l.startswith("#"))}
        snv = recs[101]
        assert snv[11].strip() == "1|0"        # s3 = (s1.1 twin, s2.1 twin)
        sep_recs = [l for l in open(sep)
                    if l.strip() and not l.startswith("#")]
        assert len(sep_recs) == len(recs)      # no overlaps in this world

    def test_multiallelic_merge(self, tmp_path):
        """Two haps with different ALT at the same position -> one
        multi-allelic record."""
        rng = np.random.default_rng(1)
        ref = rng.integers(0, 4, 300).astype(np.int8)
        h1 = ref.copy(); h1[50] = (ref[50] + 1) % 4
        h2 = ref.copy(); h2[50] = (ref[50] + 2) % 4
        fa = tmp_path / "f.fa"
        with open(fa, "w") as f:
            for n, s in [("ref", ref), ("a.1", h1), ("b.1", h2)]:
                fastx.write_fasta(f, n, s)
        paf = tmp_path / "p.paf"
        with open(paf, "w") as f:
            for q in ("a.1", "b.1"):
                f.write(f"{q}\t300\t0\t300\t+\tref\t300\t0\t300\t299\t300\t60"
                        f"\tcg:Z:50=1X249=\n")
        out = tmp_path / "o.vcf"
        assert cli.main(["paf-vcf", "-i", str(paf), "-f", str(fa),
                         "-r", "ref", "-o", str(out)]) == 0
        recs = [l.split("\t") for l in open(out)
                if l.strip() and not l.startswith("#")]
        assert len(recs) == 1
        assert len(recs[0][4].split(",")) == 2  # two ALT alleles
        gts = [recs[0][9].strip(), recs[0][10].strip()]
        assert sorted(gts) == ["1|.", "2|."]
