"""BAI indexed access (seq/bai.py): binning, index build/load round-trip,
region fetch, unplaced tail, and indexed fetch-region recruitment in the
genotype CLI (reference genotype.rs:792-870, fastx.rs:586-660)."""
import numpy as np
import pytest

from locityper_tpu.seq import bai, bam


def _codes(rng, n):
    return rng.integers(0, 4, n).astype(np.int8)


class TestBinning:
    def test_reg2bin_in_reg2bins(self):
        rng = np.random.default_rng(0)
        for _ in range(200):
            beg = int(rng.integers(0, 1 << 28))
            end = beg + int(rng.integers(1, 10000))
            assert bai.reg2bin(beg, end) in bai.reg2bins(beg, end)

    def test_small_window_bin(self):
        # A 100-bp record sits in a leaf (16 kb) bin.
        b = bai.reg2bin(100, 200)
        assert b >= 4681


@pytest.fixture
def sorted_bam(tmp_path):
    rng = np.random.default_rng(1)
    path = tmp_path / "s.bam"
    recs = []
    for rid in (0, 1):
        poss = np.sort(rng.integers(0, 200_000, 500))
        for i, p in enumerate(poss):
            recs.append((f"r{rid}_{i}", rid, int(p)))
    with bam.BamWriter(path, ["c1", "c2"], [250_000, 250_000]) as w:
        for name, rid, p in recs:
            w.write(name, 0, _codes(rng, 100), ref_id=rid, pos=p)
        for i in range(20):
            w.write(f"un{i}", bam.FLAG_UNMAPPED, _codes(rng, 100))
    return path, recs


class TestIndexFetch:
    def test_build_load_roundtrip(self, sorted_bam):
        path, _ = sorted_bam
        idx = bai.build_bai(path)
        idx2 = bai.BaiIndex.load(str(path) + ".bai")
        assert idx2.n_no_coor == 20
        assert len(idx2.refs) == 2
        for (b1, l1), (b2, l2) in zip(idx.refs, idx2.refs):
            assert b1 == b2 and l1 == l2

    def test_fetch_window(self, sorted_bam):
        path, recs = sorted_bam
        idx = bai.build_bai(path)
        for rid, beg, end in ((0, 50_000, 60_000), (1, 0, 5_000),
                              (1, 190_000, 250_000)):
            want = sorted(n for n, r, p in recs
                          if r == rid and p < end and p + 100 > beg)
            got = sorted(r.name for r in bai.fetch(path, idx, rid, beg, end))
            assert got == want

    def test_fetch_all_equals_stream(self, sorted_bam):
        path, recs = sorted_bam
        idx = bai.build_bai(path)
        got = [r.name for r in bai.fetch(path, idx, 0, 0, 250_000)]
        want = [n for n, r, _ in recs if r == 0]
        assert got == want

    def test_unplaced_tail(self, sorted_bam):
        path, _ = sorted_bam
        idx = bai.build_bai(path)
        un = [r.name for r in bai.fetch_unplaced(path, idx)]
        assert un == [f"un{i}" for i in range(20)]

    def test_unsorted_rejected(self, tmp_path):
        rng = np.random.default_rng(2)
        path = tmp_path / "u.bam"
        with bam.BamWriter(path, ["c1"], [10_000]) as w:
            w.write("a", 0, _codes(rng, 50), ref_id=0, pos=5000)
            w.write("b", 0, _codes(rng, 50), ref_id=0, pos=100)
        with pytest.raises(ValueError, match="sorted"):
            bai.build_bai(path)

    def test_record_spans_block_boundary(self, tmp_path):
        """Records crossing BGZF block boundaries must fetch intact."""
        rng = np.random.default_rng(3)
        path = tmp_path / "big.bam"
        n = 400
        with bam.BamWriter(path, ["c1"], [1 << 20]) as w:
            for i in range(n):
                # 300-bp reads: ~350 B/record -> several 60 kB blocks.
                w.write(f"b{i:03d}", 0, _codes(rng, 300), ref_id=0,
                        pos=i * 100)
        idx = bai.build_bai(path)
        got = list(bai.fetch(path, idx, 0, 0, 1 << 20))
        assert len(got) == n
        assert all(r.seq.size == 300 for r in got)


def test_genotype_cli_indexed_fetch(tmp_path, caplog):
    """End-to-end: genotype on a coordinate-sorted, indexed BAM takes the
    fetch-region path and still calls the right genotype."""
    import gzip
    import json
    import logging

    from locityper_tpu import cli, sim
    from locityper_tpu.seq import fastx

    rng = np.random.default_rng(42)
    locus = sim.simulate_locus(rng, "L1", length=3000, n_haps=4,
                               divergence=0.02)
    left = sim.random_genome(rng, 50_000)
    right = sim.random_genome(rng, 50_000)
    genome = np.concatenate([left, locus.haplotypes[0], right])
    with open(tmp_path / "ref.fa", "w") as f:
        fastx.write_fasta(f, "chr1", genome)
    (tmp_path / "loci.bed").write_text(
        f"chr1\t{left.size}\t{left.size + locus.haplotypes[0].size}\tL1\n")
    with open(tmp_path / "haps.fa", "w") as f:
        for name, seq in zip(locus.hap_names, locus.haplotypes):
            fastx.write_fasta(f, name, seq)
    assert cli.main(["add", "-d", str(tmp_path / "db"),
                     "-r", str(tmp_path / "ref.fa"),
                     "-l", str(tmp_path / "loci.bed"),
                     "-s", str(tmp_path / "haps.fa")]) == 0

    # Simulated sample: true-genotype reads "mapped" near the locus (their
    # true sampling positions), background reads placed on the flanks, all
    # coordinate-sorted + indexed.  Positions only steer the FETCH; the
    # recruitment still decides by k-mer matches.
    err = sim.ErrorModel(0.002, 0.0002, 0.0002)
    true_haps = [locus.haplotypes[i] for i in locus.true_genotype]
    lr = sim.simulate_paired_reads(rng, true_haps, depth=14.0, read_len=150,
                                   errors=err)
    br = sim.simulate_paired_reads(rng, [left, left, right, right],
                                   depth=10.0, read_len=150, errors=err)
    entries = []
    for i, (c1, c2) in enumerate(zip(lr.reads1, lr.reads2)):
        pos = int(left.size + rng.integers(0, locus.haplotypes[0].size - 300))
        entries.append((pos, f"t{i}", c1, c2))
    for i, (c1, c2) in enumerate(zip(br.reads1, br.reads2)):
        pos = int(rng.integers(0, left.size - 400))
        entries.append((pos, f"g{i}", c1, c2))
    flat = []
    for pos, name, c1, c2 in entries:
        flat.append((pos, name, bam.FLAG_PAIRED | bam.FLAG_MATE1, c1))
        flat.append((pos + 150, name, bam.FLAG_PAIRED | bam.FLAG_MATE2, c2))
    flat.sort(key=lambda t: t[0])
    bam_path = tmp_path / "sample.bam"
    with bam.BamWriter(bam_path, ["chr1"], [genome.size]) as w:
        for pos, name, flag, c in flat:
            w.write(name, flag, c, ref_id=0, pos=pos)
    assert cli.main(["index", str(bam_path)]) == 0

    # preproc from plain FASTQs of the same sample (indexed path is a
    # genotype-side feature).
    fq1, fq2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for pos, name, c1, c2 in entries:
            fastx.write_fastq(f1, fastx.Read(name, c1))
            fastx.write_fastq(f2, fastx.Read(name, c2))
    assert cli.main(["preproc", "-i", str(fq1), str(fq2),
                     "-r", str(tmp_path / "ref.fa"),
                     "-o", str(tmp_path / "bg"),
                     "-b", "chr1:1001-48000"]) == 0

    with caplog.at_level(logging.INFO, logger="locityper"):
        assert cli.main(["genotype", "-i", str(bam_path),
                         "-d", str(tmp_path / "db"),
                         "-p", str(tmp_path / "bg"),
                         "-o", str(tmp_path / "out"),
                         "-S", "anneal:i=8,a=8,n=2000,p=1000"]) == 0
    assert any("Indexed input" in r.message for r in caplog.records), \
        "fetch-region path not taken"
    res = json.load(gzip.open(tmp_path / "out" / "loci" / "L1"
                              / "res.json.gz"))
    called = sorted(res["genotype"].split(","))
    truth = sorted(locus.hap_names[i] for i in locus.true_genotype)
    assert called == truth


def test_preproc_indexed_fetch(tmp_path, caplog):
    """preproc on a sorted+indexed BAM fetches the bg region instead of
    scanning the whole input (preproc.rs:1180-1202)."""
    import logging

    from locityper_tpu import cli, sim
    from locityper_tpu.seq import fastx

    rng = np.random.default_rng(7)
    genome = sim.random_genome(rng, 60_000)
    with open(tmp_path / "ref.fa", "w") as f:
        fastx.write_fasta(f, "chr1", genome)
    err = sim.ErrorModel(0.002, 0.0002, 0.0002)
    r = sim.simulate_paired_reads(rng, [genome, genome], depth=10.0,
                                  read_len=150, errors=err)
    # Place each pair at its true position (name encodes nothing; just
    # sort all records by position).
    flat = []
    for i, (c1, c2) in enumerate(zip(r.reads1, r.reads2)):
        pos = int(rng.integers(0, genome.size - 500))
        flat.append((pos, f"p{i}", bam.FLAG_PAIRED | bam.FLAG_MATE1, c1))
        flat.append((pos + 250, f"p{i}", bam.FLAG_PAIRED | bam.FLAG_MATE2,
                     c2))
    flat.sort(key=lambda t: t[0])
    bam_path = tmp_path / "s.bam"
    with bam.BamWriter(bam_path, ["chr1"], [genome.size]) as w:
        for pos, name, flag, c in flat:
            w.write(name, flag, c, ref_id=0, pos=pos)
    bai.build_bai(bam_path)

    with caplog.at_level(logging.INFO, logger="locityper"):
        rc = cli.main(["preproc", "-i", str(bam_path),
                       "-r", str(tmp_path / "ref.fa"),
                       "-o", str(tmp_path / "bg"),
                       "-b", "chr1:5001-55000"])
    assert rc == 0
    assert any("Indexed input" in r.message for r in caplog.records)
    assert (tmp_path / "bg" / "bg" / "distr.json.gz").exists() or \
        list((tmp_path / "bg").rglob("*.json.gz"))
