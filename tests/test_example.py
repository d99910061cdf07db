"""The end-to-end example must run and produce a coherent decode."""

import sys

import numpy as np


def test_gene_prediction_example(tmp_path, capsys):
    sys.path.insert(0, "examples")
    import gene_prediction as gp

    rng = np.random.default_rng(1)
    seq = "".join(rng.choice(list("ACGT"), size=256))
    fa = tmp_path / "c.fa"
    fa.write_text(f">ctg1\n{seq}\n")
    assert gp.main([str(fa), "--window", "64", "--batch", "2",
                    "--parallel-factor", "4"]) == 0
    out = capsys.readouterr().out
    assert "ctg1: L=256" in out


def test_distributed_training_example():
    sys.path.insert(0, "examples")
    import distributed_training as dt

    assert dt.main(["--steps", "6", "--batch", "4", "--length", "32"]) == 0


def test_intervals_roundtrip():
    sys.path.insert(0, "examples")
    import gene_prediction as gp

    track = np.asarray([0, 0, 4, 4, 4, 1, 0], np.int32)
    runs = gp.intervals(track)
    assert runs == [("Ir", 0, 2), ("E0", 2, 5), ("I0", 5, 6), ("Ir", 6, 7)]
    # intervals cover the track exactly
    assert sum(e - s for _, s, e in runs) == len(track)
