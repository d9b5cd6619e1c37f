"""Regression tests for the round-3 code-review findings: FASTA inputs
must never enter the native FASTQ fast path, indexed CRAM fetch must not
re-parse the reference per region, preproc's background fetch is
region-only with aligned pair layout, and --out-sams/--out-bams can be
combined (records generated once, teed to both formats)."""
import gzip

import numpy as np
import pytest

from locityper_tpu import cli, sim
from locityper_tpu.seq import fastx
from locityper_tpu.seq.fastx import is_fastq_files
from locityper_tpu.utils.io import smart_create


class TestIsFastq:
    def test_detects_formats(self, tmp_path):
        fq = tmp_path / "a.fq"
        fq.write_text("@r1\nACGT\n+\nIIII\n")
        fa = tmp_path / "b.fa"
        fa.write_text(">r1\nACGT\n")
        fqgz = tmp_path / "c.fq.gz"
        with gzip.open(fqgz, "wt") as f:
            f.write("@r1\nACGT\n+\nIIII\n")
        assert is_fastq_files([fq])
        assert is_fastq_files([fqgz])
        assert not is_fastq_files([fa])
        assert not is_fastq_files([fq, fa])
        assert not is_fastq_files([tmp_path / "missing.fq"])

    def test_leading_whitespace_tolerated(self, tmp_path):
        fq = tmp_path / "w.fq"
        fq.write_text("\n@r1\nACGT\n+\nIIII\n")
        assert is_fastq_files([fq])


class TestRecruitFastaInputs:
    def test_paired_fasta_recruits(self, tmp_path):
        """Paired FASTA input must route around the native FASTQ parser
        (which yields zero records on '>') and still recruit reads —
        previously the fast path silently wrote empty outputs."""
        rng = np.random.default_rng(7)
        locus = sim.simulate_locus(rng, "T", length=3000, n_haps=3,
                                   divergence=0.01)
        target = tmp_path / "target.fa"
        with open(target, "w") as f:
            for name, seq in zip(locus.hap_names, locus.haplotypes):
                fastx.write_fasta(f, name, seq)
        err = sim.ErrorModel(0.002, 0.0002, 0.0002)
        reads = sim.simulate_paired_reads(
            rng, [locus.haplotypes[i] for i in locus.true_genotype],
            depth=6.0, errors=err, prefix="p")
        fa1, fa2 = tmp_path / "r_1.fa", tmp_path / "r_2.fa"
        with open(fa1, "w") as f1, open(fa2, "w") as f2:
            for n, a, b in zip(reads.names, reads.reads1, reads.reads2):
                fastx.write_fasta(f1, n, a)
                fastx.write_fasta(f2, n, b)
        out = tmp_path / "rec.fq"
        rc = cli.main(["recruit", "-i", str(fa1), str(fa2),
                       "-s", str(target), "-o", str(out), "--seed", "3"])
        assert rc == 0
        got = sum(1 for _ in fastx.read_fastq(out))
        assert got > len(reads.names)   # both mates of most true pairs


class TestCraiSingleOpen:
    def test_crai_records_opens_one_cramfile(self, tmp_path, monkeypatch):
        """_crai_records must decode the reference/CRAM header once for
        ALL regions — per-region reopens re-parsed the whole reference
        FASTA (review finding #3)."""
        from locityper_tpu.seq import crai as craio
        from locityper_tpu.seq import cram as cramio
        from locityper_tpu.commands.genotype import _crai_records

        rng = np.random.default_rng(11)
        ref = {"c1": rng.integers(0, 4, 50_000).astype(np.int8)}
        path = tmp_path / "x.cram"
        with cramio.CramWriter(path, ["c1"], [50_000], reference=ref) as w:
            for i, p in enumerate(np.sort(rng.integers(0, 49_800, 800))):
                w.write(f"r{i}", 0, ref["c1"][p:p + 100], ref_id=0,
                        pos=int(p))
        craio.build_crai(path)

        opens = []
        orig_init = cramio.CramFile.__init__

        def counting_init(self, *a, **kw):
            opens.append(1)
            return orig_init(self, *a, **kw)

        monkeypatch.setattr(cramio.CramFile, "__init__", counting_init)
        per = {"c1": [(1000, 3000), (10_000, 12_000), (30_000, 31_000)]}
        recs = list(_crai_records(path, per, ref))
        assert recs
        assert sum(opens) == 1

    def test_unplaced_skippable(self, tmp_path):
        from locityper_tpu.seq import crai as craio
        from locityper_tpu.seq import cram as cramio
        from locityper_tpu.commands.genotype import _crai_records

        rng = np.random.default_rng(12)
        ref = {"c1": rng.integers(0, 4, 20_000).astype(np.int8)}
        path = tmp_path / "u.cram"
        with cramio.CramWriter(path, ["c1"], [20_000], reference=ref) as w:
            for i, p in enumerate(np.sort(rng.integers(0, 19_800, 100))):
                w.write(f"r{i}", 0, ref["c1"][p:p + 100], ref_id=0,
                        pos=int(p))
            for i in range(5):
                w.write(f"un{i}", cramio.FLAG_UNMAPPED,
                        rng.integers(0, 4, 100).astype(np.int8))
        craio.build_crai(path)
        per = {"c1": [(0, 20_000)]}
        with_tail = list(_crai_records(path, per, ref))
        without = list(_crai_records(path, per, ref, unplaced=False))
        assert len(with_tail) == len(without) + 5
        assert all(r.pos >= 0 for r in without)


class TestBgFetchLayout:
    def test_paired_layout_stays_aligned(self, tmp_path):
        """_fetch_bg_reads: orphan singles must not interleave into the
        paired reads1/reads2 arrays (pre-existing desync bug), and the
        unplaced tail must not be decoded (region-only fetch)."""
        from types import SimpleNamespace

        from locityper_tpu.seq import bai as baio
        from locityper_tpu.seq import bam as bamio
        from locityper_tpu.commands.preproc import _fetch_bg_reads

        rng = np.random.default_rng(13)
        genome = {"c1": rng.integers(0, 4, 60_000).astype(np.int8)}
        path = tmp_path / "bg.bam"
        F = bamio.FLAG_PAIRED
        recs = []
        poss = np.sort(rng.integers(5_000, 40_000, 60))
        for i, p in enumerate(poss):
            p = int(p)
            # Every 5th read's mate lies far outside the region
            # (orphan); others pair within it.
            if i % 5 == 0:
                recs.append((p, f"o{i}", F | bamio.FLAG_MATE1))
            else:
                recs.append((p, f"p{i}", F | bamio.FLAG_MATE1))
                recs.append((p + 200, f"p{i}", F | bamio.FLAG_MATE2))
        recs.sort()
        with bamio.BamWriter(path, ["c1"], [60_000]) as w:
            for p, name, flag in recs:
                w.write(name, flag, genome["c1"][p:p + 100], ref_id=0,
                        pos=p)
            # Unplaced tail records — must never be decoded here.
            for i in range(8):
                w.write(f"un{i}", bamio.FLAG_UNMAPPED | F,
                        rng.integers(0, 4, 100).astype(np.int8))
        baio.build_bai(path)

        args = SimpleNamespace(input=[str(path)], reference=None)
        got = _fetch_bg_reads(args, genome, "c1", 5_000, 41_000)
        assert got is not None
        reads1, reads2, padded = got
        # Majority are pairs: layout is index-aligned pairs only.
        assert len(reads1) == len(reads2) > 0


class TestBothOutputFormats:
    def test_out_sams_and_out_bams_together(self, tmp_path):
        """--out-sams with --out-bams writes BOTH (review finding #6);
        record content identical across the two sinks."""
        from test_pipeline import make_bg, make_locus

        from locityper_tpu.model import Params
        from locityper_tpu.pipeline import genotype_locus
        from locityper_tpu.seq import bam as bamio
        from locityper_tpu.solvers.solve import Scheme

        rng, locus, data = make_locus(seed=21, n_haps=4)
        true_haps = [locus.haplotypes[i] for i in locus.true_genotype]
        err = sim.ErrorModel(0.002, 0.0002, 0.0002)
        reads = sim.simulate_paired_reads(rng, true_haps, depth=8.0,
                                          errors=err)
        pairs = list(zip(reads.reads1, reads.reads2))[:120]
        names = reads.names[:120]
        bg = make_bg()
        params = Params(unmapped_penalty=bg.seq_info.technology
                        .default_unmapped_penalty(), out_sams=1, out_bams=1)
        params.set_tweak_size(bg.depth.window_size)
        params.band = 48
        scheme = Scheme.parse(["anneal:i=4,a=4,n=1000,p=600"])
        genotype_locus(data, pairs, names, bg, params=params, scheme=scheme,
                       seed=3, sam_dir=tmp_path / "alns")
        sam = tmp_path / "alns" / "00.sam.gz"
        bam_p = tmp_path / "alns" / "00.bam"
        assert sam.exists() and bam_p.exists()
        sam_rows = [l.split("\t") for l in gzip.open(sam, "rt")
                    if not l.startswith("@")]
        bam_recs = list(bamio.read_bam_records(bam_p, keep_flags=0))
        assert len(sam_rows) == len(bam_recs) > 30
        for sl, br in zip(sam_rows, bam_recs):
            assert sl[0] == br.name
            assert int(sl[1]) == br.flag
