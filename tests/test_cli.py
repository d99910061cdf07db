"""End-to-end CLI tests: align (protein FASTA -> aligned FASTA) and
predict (DNA FASTA -> GFF3), driven in-process via cli.main()."""

import numpy as np
import pytest

from hmm_layer_tpu import data
from hmm_layer_tpu.cli import _model_lengths, build_parser, main


class TestParser:
    def test_requires_command(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args([])

    def test_align_args(self):
        args = build_parser().parse_args(
            ["align", "-i", "in.fa", "-o", "out.fa", "--models", "2"]
        )
        assert args.command == "align" and args.models == 2

    def test_cache_dir_flag(self, tmp_path, monkeypatch):
        monkeypatch.delenv("HMM_COMPILE_CACHE", raising=False)
        args = build_parser().parse_args(
            ["--cache-dir", str(tmp_path), "evaluate",
             "--pred", "a", "--truth", "b"]
        )
        assert args.cache_dir == str(tmp_path)
        monkeypatch.setenv("HMM_COMPILE_CACHE", "/x/y")
        args = build_parser().parse_args(
            ["evaluate", "--pred", "a", "--truth", "b"]
        )
        assert args.cache_dir == "/x/y"

    def test_model_lengths(self):
        assert _model_lengths([10, 12, 14], 3, None) == [9, 10, 11]
        assert _model_lengths([10], 1, 5) == [5]
        assert _model_lengths([3, 3], 3, None) == [2, 2, 3]


class TestAlign:
    def test_align_end_to_end(self, tmp_path):
        rng = np.random.default_rng(0)
        consensus = "MKLVAEQWRD"
        fasta = tmp_path / "prot.fa"
        names = []
        with open(fasta, "w") as fh:
            for i in range(8):
                seq = "".join(
                    c
                    for c in consensus
                    if rng.random() > 0.1  # deletions
                )
                if rng.random() < 0.5:
                    seq += "AG"  # C-terminal insertions
                names.append(f"seq{i}")
                fh.write(f">seq{i} desc\n{seq}\n")
        out = tmp_path / "aln.fa"
        rc = main(
            [
                "align",
                "-i", str(fasta),
                "-o", str(out),
                "--models", "2",
                "--steps", "6",
                "--batch", "8",
                "--cpu",
            ]
        )
        assert rc == 0
        aln = list(data.read_fasta(out))
        assert [n for n, _ in aln] == names
        rows = [r for _, r in aln]
        # Aligned FASTA: equal-length rows whose residues (minus gaps)
        # reproduce the input sequences.
        assert len({len(r) for r in rows}) == 1
        orig = dict(
            (n, s) for n, s in data.read_fasta(fasta)
        )
        for n, row in aln:
            residues = row.replace("-", "").replace(".", "").upper()
            assert residues == orig[n]

    def test_align_with_adaptation(self, tmp_path):
        """--adapt-rounds: learnMSA-style length adaptation mid-training."""
        rng = np.random.default_rng(3)
        consensus = "MKLVAEQWRD"
        fasta = tmp_path / "prot.fa"
        with open(fasta, "w") as fh:
            for i in range(8):
                seq = "".join(c for c in consensus if rng.random() > 0.1)
                fh.write(f">seq{i}\n{seq}\n")
        out = tmp_path / "aln.fa"
        rc = main(
            [
                "align",
                "-i", str(fasta),
                "-o", str(out),
                "--models", "1",
                "--steps", "8",
                "--adapt-rounds", "1",
                "--batch", "8",
                "--cpu",
            ]
        )
        assert rc == 0
        aln = list(data.read_fasta(out))
        orig = dict(data.read_fasta(fasta))
        assert len({len(r) for _, r in aln}) == 1
        for n, row in aln:
            assert row.replace("-", "").replace(".", "").upper() == orig[n]

    def test_align_empty_input(self, tmp_path):
        fasta = tmp_path / "empty.fa"
        fasta.write_text("")
        rc = main(
            ["align", "-i", str(fasta), "-o", str(tmp_path / "o"), "--cpu"]
        )
        assert rc == 2


class TestPredict:
    def _write_contig(self, path, L=96):
        rng = np.random.default_rng(1)
        seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=L))
        with open(path, "w") as fh:
            fh.write(f">ctg1\n{seq}\n")
        return seq

    def test_predict_uniform_prior(self, tmp_path):
        fasta = tmp_path / "dna.fa"
        self._write_contig(fasta)
        out = tmp_path / "out.gff3"
        rc = main(
            [
                "predict",
                "-i", str(fasta),
                "-o", str(out),
                "--window", "48",
                "--overlap", "8",
                "--parallel-factor", "4",
                "--cpu",
            ]
        )
        assert rc == 0
        text = out.read_text()
        assert text.startswith("##gff-version 3\n")
        # With a strong intergenic prior the decode is usually all-Ir;
        # any reported feature must be well-formed.
        for line in text.splitlines()[1:]:
            cols = line.split("\t")
            assert len(cols) == 9 and cols[0] == "ctg1"
            assert 1 <= int(cols[3]) <= int(cols[4]) <= 96

    def test_predict_with_class_probs(self, tmp_path):
        # Plant a gene via near-one-hot class probabilities (the upstream
        # network's job) and check it comes back out as GFF3 rows.
        Ir, E0, E1, E2, ST, SP = 0, 4, 5, 6, 7, 14
        true_path = np.zeros(32, np.int64)
        gene = [ST, E1, E2, E0, E1, E2, E0, E1, SP]
        true_path[10 : 10 + len(gene)] = gene
        nt = "ACGT"
        rng = np.random.default_rng(2)
        bases = [nt[i] for i in rng.integers(0, 4, size=32)]
        # Three planted codons: ATG (start, t=10..12), GCT (mid-exon,
        # non-stop — the E2 at t=15 right-window sees it), TAA (stop,
        # t=16..18, ending at the STOP state).
        bases[10:13] = "ATG"
        bases[13:16] = "GCT"
        bases[16:19] = "TAA"
        fasta = tmp_path / "dna.fa"
        with open(fasta, "w") as fh:
            fh.write(">ctg1\n" + "".join(bases) + "\n")

        cls = np.full((32, 15), 0.005, np.float32)
        cls[np.arange(32), true_path] = 1.0
        cls /= cls.sum(-1, keepdims=True)
        npz = tmp_path / "cls.npz"
        np.savez(npz, ctg1=cls)

        out = tmp_path / "out.gff3"
        rc = main(
            [
                "predict",
                "-i", str(fasta),
                "-o", str(out),
                "--class-probs", str(npz),
                "--window", "32",
                "--parallel-factor", "1",
                "--cpu",
            ]
        )
        assert rc == 0
        lines = [
            ln for ln in out.read_text().splitlines() if "\tgene\t" in ln
        ]
        assert len(lines) == 1
        cols = lines[0].split("\t")
        assert (cols[3], cols[4]) == ("11", "19")  # 1-based inclusive

    def test_predict_both_strands(self, tmp_path):
        # Same planted gene as above, but on the MINUS strand: the contig
        # is the reverse complement of the gene-bearing sequence, and the
        # planted class probabilities go under the '<name>__rc' key.
        Ir, E0, E1, E2, ST, SP = 0, 4, 5, 6, 7, 14
        true_path = np.zeros(32, np.int64)
        gene = [ST, E1, E2, E0, E1, E2, E0, E1, SP]
        true_path[10 : 10 + len(gene)] = gene
        nt = "ACGT"
        rng = np.random.default_rng(2)
        bases = [nt[i] for i in rng.integers(0, 4, size=32)]
        bases[10:13] = "ATG"
        bases[13:16] = "GCT"
        bases[16:19] = "TAA"
        plus_view = "".join(bases)
        contig = data.revcomp(plus_view)

        fasta = tmp_path / "dna.fa"
        with open(fasta, "w") as fh:
            fh.write(f">ctg1\n{contig}\n")

        planted = np.full((32, 15), 0.005, np.float32)
        planted[np.arange(32), true_path] = 1.0
        planted /= planted.sum(-1, keepdims=True)
        intergenic = np.full((32, 15), 0.02, np.float32)
        intergenic[:, 0] = 0.72
        npz = tmp_path / "cls.npz"
        np.savez(npz, ctg1=intergenic, ctg1__rc=planted)

        out = tmp_path / "out.gff3"
        rc = main(
            [
                "predict",
                "-i", str(fasta),
                "-o", str(out),
                "--class-probs", str(npz),
                "--both-strands",
                "--window", "32",
                "--parallel-factor", "1",
                "--cpu",
            ]
        )
        assert rc == 0
        gene_rows = [
            ln for ln in out.read_text().splitlines() if "\tgene\t" in ln
        ]
        assert len(gene_rows) == 1
        cols = gene_rows[0].split("\t")
        # rc-space (10, 19) half-open -> forward (13, 22) -> 1-based 14..22.
        assert (cols[3], cols[4], cols[6]) == ("14", "22", "-")

    def test_predict_missing_contig_key(self, tmp_path):
        fasta = tmp_path / "dna.fa"
        self._write_contig(fasta, L=16)
        npz = tmp_path / "cls.npz"
        np.savez(npz, other=np.zeros((16, 15), np.float32))
        with pytest.raises(KeyError):
            main(
                [
                    "predict",
                    "-i", str(fasta),
                    "-o", str(tmp_path / "o.gff3"),
                    "--class-probs", str(npz),
                    "--window", "16",
                    "--parallel-factor", "1",
                    "--cpu",
                ]
            )


class TestTrainEvaluate:
    def _planted(self, tmp_path):
        """Contig with one planted gene + class probs + truth GFF3."""
        from hmm_layer_tpu.models import paths_to_genes, write_gff3

        true_path = np.zeros(32, np.int64)
        ST, E1, E2, E0, SP = 7, 5, 6, 4, 14
        gene = [ST, E1, E2, E0, E1, E2, E0, E1, SP]
        true_path[10 : 10 + len(gene)] = gene
        nt = "ACGT"
        rng = np.random.default_rng(2)
        bases = [nt[i] for i in rng.integers(0, 4, size=32)]
        bases[10:13] = "ATG"
        bases[13:16] = "GCT"
        bases[16:19] = "TAA"
        fasta = tmp_path / "dna.fa"
        fasta.write_text(">ctg1\n" + "".join(bases) + "\n")

        cls = np.full((32, 15), 0.005, np.float32)
        cls[np.arange(32), true_path] = 1.0
        cls /= cls.sum(-1, keepdims=True)
        npz = tmp_path / "cls.npz"
        np.savez(npz, ctg1=cls)

        truth = tmp_path / "truth.gff3"
        write_gff3(
            {"ctg1": paths_to_genes(true_path, num_states=15)}, truth
        )
        return fasta, npz, truth

    def test_train_predict_evaluate_round_trip(self, tmp_path, capsys):
        import json

        fasta, npz, truth = self._planted(tmp_path)
        ckpt_out = tmp_path / "trained.npz"
        rc = main(
            [
                "train",
                "-i", str(fasta),
                "-a", str(truth),
                "-o", str(ckpt_out),
                "--class-probs", str(npz),
                "--steps", "10",
                "--lr", "0.03",
                "--window", "32",
                "--batch", "2",
                "--parallel-factor", "1",
                "--cpu",
            ]
        )
        assert rc == 0 and ckpt_out.exists()
        out_text = capsys.readouterr().out
        assert "final loss" in out_text

        pred = tmp_path / "pred.gff3"
        rc = main(
            [
                "predict",
                "-i", str(fasta),
                "-o", str(pred),
                "--params", str(ckpt_out),
                "--class-probs", str(npz),
                "--window", "32",
                "--parallel-factor", "1",
                "--cpu",
            ]
        )
        assert rc == 0
        capsys.readouterr()

        rc = main(["evaluate", "--pred", str(pred), "--truth", str(truth)])
        assert rc == 0
        metrics = json.loads(capsys.readouterr().out)
        assert metrics["gene"]["f1"] == 1.0
        assert metrics["nucleotide"]["f1"] == 1.0

    def test_train_ce_requires_annotation(self, tmp_path):
        fasta = tmp_path / "dna.fa"
        fasta.write_text(">c\nACGTACGT\n")
        rc = main(
            ["train", "-i", str(fasta), "-o", str(tmp_path / "p.npz"),
             "--cpu"]
        )
        assert rc == 2

    def test_train_map_objective_unsupervised(self, tmp_path):
        fasta = tmp_path / "dna.fa"
        rng = np.random.default_rng(3)
        fasta.write_text(
            ">c\n" + "".join("ACGT"[i] for i in rng.integers(0, 4, 48)) + "\n"
        )
        out = tmp_path / "p.npz"
        rc = main(
            [
                "train",
                "-i", str(fasta),
                "-o", str(out),
                "--objective", "map",
                "--steps", "4",
                "--window", "16",
                "--batch", "2",
                "--parallel-factor", "1",
                "--cpu",
            ]
        )
        assert rc == 0 and out.exists()
