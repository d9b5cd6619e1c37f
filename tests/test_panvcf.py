"""Pangenome VCF haplotype reconstruction."""
import numpy as np

from locityper_tpu.seq import dna
from locityper_tpu.seq.panvcf import haplotypes_from_vcf, read_vcf, reconstruct_sequences


def write_vcf(path, rows, samples):
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + "\t".join(samples) + "\n")
        for r in rows:
            f.write("\t".join(r) + "\n")


class TestPanVcf:
    def test_basic_reconstruction(self, tmp_path):
        #        0123456789
        ref = "ACGTACGTAC"
        vcf = tmp_path / "p.vcf"
        write_vcf(vcf, [
            # SNV at pos 3 (1-based 4): T->G ; hap S1.1 has it
            ["chr1", "4", ".", "T", "G", ".", "PASS", ".", "GT", "1|0", "0|0"],
            # Deletion at pos 6 (1-based 7): GTA->G ; S2.2 has it
            ["chr1", "7", ".", "GTA", "G", ".", "PASS", ".", "GT", "0|0", "0|1"],
        ], ["S1", "S2"])
        haps = haplotypes_from_vcf(vcf, dna.encode(ref), "chr1", 0, 10)
        names = [n for n, _ in haps]
        assert names == ["chr1:1-10", "S1.1", "S1.2", "S2.1", "S2.2"]
        seqs = {n: dna.decode(s) for n, s in haps}
        assert seqs["chr1:1-10"] == ref
        assert seqs["S1.1"] == "ACGGACGTAC"       # SNV applied
        assert seqs["S1.2"] == ref
        assert seqs["S2.2"] == "ACGTACGC"          # 2bp deletion
        assert seqs["S2.1"] == ref

    def test_insertion_and_multiallelic(self, tmp_path):
        ref = "AAAACCCC"
        vcf = tmp_path / "p.vcf"
        write_vcf(vcf, [
            ["chr1", "4", ".", "A", "ATT,AG", ".", "PASS", ".", "GT",
             "1|2"],
        ], ["S"])
        haps = haplotypes_from_vcf(vcf, dna.encode(ref), "chr1", 0, 8)
        seqs = {n: dna.decode(s) for n, s in haps}
        assert seqs["S.1"] == "AAAATTCCCC"   # insertion TT
        assert seqs["S.2"] == "AAAAGCCCC"    # A->AG inserts G after the A

    def test_unknown_genotype_tolerance(self, tmp_path):
        ref = "ACGTACGTACGT"
        vcf = tmp_path / "p.vcf"
        rows = []
        for i in range(10):
            pos = i + 1
            rows.append(["chr1", str(pos), ".", ref[pos - 1], "A" if ref[pos - 1] != "A" else "C",
                        ".", "PASS", ".", "GT", ".|."])
        write_vcf(vcf, rows, ["S"])
        hap_names, variants = read_vcf(vcf, "chr1", 0, 12)
        out = reconstruct_sequences(dna.encode(ref), 0, hap_names, variants,
                                    max_unknown_frac=0.5)
        assert out == []  # all genotypes unknown -> dropped

    def test_leave_out(self, tmp_path):
        ref = "ACGTACGT"
        vcf = tmp_path / "p.vcf"
        write_vcf(vcf, [["chr1", "2", ".", "C", "T", ".", "PASS", ".", "GT",
                         "1|1", "0|0"]], ["KEEP", "DROP"])
        haps = haplotypes_from_vcf(vcf, dna.encode(ref), "chr1", 0, 8,
                                   leave_out=("DROP",))
        names = [n for n, _ in haps]
        assert "DROP.1" not in names and "KEEP.1" in names


class TestAddFromVcf:
    def test_add_command_with_vcf(self, tmp_path):
        import numpy as np
        from locityper_tpu import cli, sim
        from locityper_tpu.seq import fastx
        rng = np.random.default_rng(3)
        genome = sim.random_genome(rng, 30000)
        ref_fa = tmp_path / "ref.fa"
        with open(ref_fa, "w") as f:
            fastx.write_fasta(f, "chr1", genome)
        bed = tmp_path / "loci.bed"
        bed.write_text("chr1\t10000\t13000\tG1\n")
        # VCF with 2 samples, some phased SNVs inside the locus.
        vcf = tmp_path / "pan.vcf"
        rows = []
        gts = [("1|0", "0|0"), ("0|0", "0|1"), ("1|0", "0|1")]
        for (pos, gt) in zip((10500, 11200, 12100), gts):
            ref_base = dna.decode(genome[pos:pos + 1])
            alt = "ACGT"[("ACGT".index(ref_base) + 1) % 4]
            rows.append(["chr1", str(pos + 1), ".", ref_base, alt, ".",
                         "PASS", ".", "GT", gt[0], gt[1]])
        write_vcf(vcf, rows, ["SA", "SB"])
        db = tmp_path / "db"
        rc = cli.main(["add", "-d", str(db), "-r", str(ref_fa),
                       "-l", str(bed), "-v", str(vcf)])
        assert rc == 0
        haps = [(r.name, r.seq) for r in
                fastx.read_fastx_auto(db / "loci" / "G1" / "haplotypes.fa.gz")]
        names = [n for n, _ in haps]
        # ref + 4 sample haplotypes; SA.2 == SB.1 == ref -> deduplicated.
        assert "chr1:10001-13000" in names
        assert "SA.1" in names and "SB.2" in names  # distinct variant sets
        assert len(names) == 3
