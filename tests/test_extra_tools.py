"""Tests for extra/ role twins added in round 5: weight_exons, annotate,
check_overlaps (reference extra/{weight_exons,annotate,check_overlaps}.py)."""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_tool(name, *args):
    return subprocess.run(
        [sys.executable, str(REPO / "extra" / name), *map(str, args)],
        capture_output=True, text=True)


class TestWeightExons:
    def setup_files(self, tmp_path):
        fa = tmp_path / "haps.fa"
        fa.write_text(">h1\n" + "ACGT" * 50 + "\n>h2\n" + "ACGT" * 25 + "\n")
        # h1: gene 20-120 (0-based 19..120), CDS 40-60 and 80-100.
        (tmp_path / "h1.gtf").write_text(
            'chr\tsrc\tgene\t20\t120\t.\t+\t.\tgene_name "G1";\n'
            'chr\tsrc\tCDS\t41\t60\t.\t+\t.\tgene_name "G1";\n'
            'chr\tsrc\tstart_codon\t81\t100\t.\t+\t.\tgene_name "G1";\n'
            'chr\tsrc\tgene\t5\t50\t.\t+\t.\tgene_name "OTHER";\n')
        (tmp_path / "h2.gtf").write_text("# no annotation for this gene\n")
        return fa

    def test_classes_and_weights(self, tmp_path):
        fa = self.setup_files(tmp_path)
        out = tmp_path / "w.bed"
        r = run_tool("weight_exons.py", "-i", fa, "-a",
                     str(tmp_path) + "/{}.gtf", "-g", "G1", "-o", out)
        assert r.returncode == 0, r.stderr
        rows = [l.split("\t") for l in out.read_text().splitlines()]
        by_hap = {}
        for name, s, e, w in rows:
            by_hap.setdefault(name, []).append((int(s), int(e), float(w)))
        # h2 has no G1 annotation: one intergenic run covering everything.
        assert by_hap["h2"] == [(0, 100, 0.01)]
        h1 = by_hap["h1"]
        # Runs tile [0, 200) without gaps.
        assert h1[0][0] == 0 and h1[-1][1] == 200
        for (s1, e1, _), (s2, e2, _) in zip(h1, h1[1:]):
            assert e1 == s2
        lookup = {}
        for s, e, w in h1:
            for p in range(s, e):
                lookup[p] = w
        assert lookup[0] == 0.01 and lookup[150] == 0.01   # intergenic
        assert lookup[25] == 0.5 and lookup[65] == 0.5     # intron/UTR
        assert lookup[45] == 1.0 and lookup[85] == 1.0     # CDS, start_codon
        assert lookup[19] == 0.5 and lookup[119] == 0.5    # gene boundaries
        assert lookup[40] == 1.0 and lookup[59] == 1.0     # CDS boundaries

    def test_discarded_twins(self, tmp_path):
        fa = self.setup_files(tmp_path)
        disc = tmp_path / "disc.txt"
        disc.write_text("h1 = hX, hY\n")
        out = tmp_path / "w.bed"
        r = run_tool("weight_exons.py", "-i", fa, "-a",
                     str(tmp_path) + "/{}.gtf", "-g", "G1",
                     "-d", disc, "-o", out)
        assert r.returncode == 0, r.stderr
        rows = [l.split("\t") for l in out.read_text().splitlines()]
        haps = {r[0] for r in rows}
        assert {"h1", "h2", "hX", "hY"} <= haps
        h1_rows = [r[1:] for r in rows if r[0] == "h1"]
        assert [r[1:] for r in rows if r[0] == "hX"] == h1_rows


class TestAnnotate:
    def test_basic_and_tags(self, tmp_path):
        calls = tmp_path / "calls.tsv"
        calls.write_text(
            "sample\tlocus\tgenotype\tquality\n"
            "s1\tHLA-A\th1,h2\t30.0\n"
            "s1\tHLA-B\t*\t0.0\n"
            "s2\tHLA-A\th2,h9\t21.0\n"
            "s1\tUNANNOT\th1,h1\t11.0\n")
        annot = tmp_path / "annot.tsv"
        annot.write_text(
            "# locus hap label tag\n"
            "HLA-A\th1\tA*01:01\tfull\n"
            "HLA-A\th2\tA*02:05\tfull\n"
            "HLA-A\th1\tA*01\tgroup\n"
            "HLA-A\th2\tA*02\tgroup\n"
            "HLA-B\th1\tB*07:02\n")
        out = tmp_path / "out.tsv"
        r = run_tool("annotate.py", "-i", calls, "-a", annot, "-o", out)
        assert r.returncode == 0, r.stderr
        lines = out.read_text().splitlines()
        assert lines[0] == "sample\tlocus\ttag\talleles"
        body = set(lines[1:])
        assert "s1\tHLA-A\tfull\tA*01:01,A*02:05" in body
        assert "s1\tHLA-A\tgroup\tA*01,A*02" in body
        assert "s1\tHLA-B\t*\t<NOCALL>" in body
        assert "s2\tHLA-A\tfull\tA*02:05,<UNKNOWN>" in body
        assert not any("UNANNOT" in l for l in body)   # unannotated skipped

    def test_untagged_has_no_tag_column(self, tmp_path):
        calls = tmp_path / "calls.tsv"
        calls.write_text("sample\tlocus\tgenotype\ns1\tL\th1,h1\n")
        annot = tmp_path / "annot.tsv"
        annot.write_text("L\th1\tALLELE1\n")
        out = tmp_path / "out.tsv"
        r = run_tool("annotate.py", "-i", calls, "-a", annot, "-o", out)
        assert r.returncode == 0, r.stderr
        lines = out.read_text().splitlines()
        assert lines[0] == "sample\tlocus\talleles"
        assert lines[1] == "s1\tL\tALLELE1,ALLELE1"


class TestCheckOverlaps:
    @staticmethod
    def make_db(tmp_path, loci):
        db = tmp_path / "db"
        for name, chrom, start, end in loci:
            d = db / "loci" / name
            d.mkdir(parents=True)
            (d / "ref.bed").write_text(f"{chrom}\t{start}\t{end}\t{name}\n")
            (d / "success").write_text("")
        return db

    def test_classification(self, tmp_path):
        db = self.make_db(tmp_path, [
            ("big", "chr1", 100, 1000),
            ("inside", "chr1", 200, 300),      # contained -> redundant
            ("same", "chr1", 100, 1000),       # identical -> redundant
            ("partial", "chr1", 900, 1200),    # overlap only -> kept
            ("faraway", "chr2", 100, 1000),    # other chrom -> kept
        ])
        csv = tmp_path / "pairs.tsv"
        r = run_tool("check_overlaps.py", db, "-O", csv)
        assert r.returncode == 0, r.stderr
        assert "2 / 5 redundant" in r.stderr
        pairs = {tuple(l.split("\t")[:2])
                 for l in csv.read_text().splitlines()[1:]}
        assert ("big", "same") in pairs or ("same", "big") in pairs
        assert any("inside" in p for p in pairs)
        assert any("partial" in p for p in pairs)
        assert not any("faraway" in p for p in pairs)

    def test_move(self, tmp_path):
        # Of an identical pair, the first-sorted locus is kept.
        db = self.make_db(tmp_path, [
            ("aaa_keep", "chr1", 0, 500),
            ("zzz_dup", "chr1", 0, 500),
        ])
        r = run_tool("check_overlaps.py", db, "-m")
        assert r.returncode == 0, r.stderr
        assert not (db / "loci" / "zzz_dup").exists()
        assert (db / "redundant" / "zzz_dup" / "ref.bed").exists()
        assert (db / "loci" / "aaa_keep").exists()
