"""Gene-structure annotation (state path -> GFF3) tests.

State indices follow the gene-pred state order
(``models/gene_pred_transitions.py``): 15-state grammar
``Ir=0, I0-2=1..3, E0-2=4..6, START=7, EI0-2=8..10, IE0-2=11..13,
STOP=14``.
"""

import numpy as np
import pytest

from hmm_layer_tpu.models.annotation import (
    EI,
    EXON,
    IE,
    INTERGENIC,
    INTRON,
    START,
    STOP,
    GeneFeature,
    classify_states,
    flip_genes,
    genes_to_gff3,
    paths_to_genes,
    write_gff3,
)

Ir, I0, I1, I2, E0, E1, E2 = range(7)
ST, EI0, EI1, EI2, IE0, IE1, IE2, SP = range(7, 15)


class TestClassify:
    def test_15_state(self):
        kind, pos, copy = classify_states(15)
        assert kind[Ir] == INTERGENIC
        assert list(kind[I0 : I2 + 1]) == [INTRON] * 3
        assert list(kind[E0 : E2 + 1]) == [EXON] * 3
        assert kind[ST] == START and kind[SP] == STOP
        assert list(kind[EI0 : EI2 + 1]) == [EI] * 3
        assert list(kind[IE0 : IE2 + 1]) == [IE] * 3
        # codon positions: E_i at i; EI_i follows E_i; IE_i precedes E_i.
        assert list(pos[E0 : E2 + 1]) == [0, 1, 2]
        assert pos[ST] == 0 and pos[SP] == 2
        assert list(pos[EI0 : EI2 + 1]) == [1, 2, 0]
        assert list(pos[IE0 : IE2 + 1]) == [2, 0, 1]
        assert pos[Ir] == -1
        assert np.all(copy == 0)

    def test_multi_copy(self):
        kind, pos, copy = classify_states(1 + 14 * 3)
        # State order interleaves phase blocks of width k=3.
        assert kind[0] == INTERGENIC
        assert list(copy[1:4]) == [0, 1, 2]  # I0 x3
        assert kind[1 + 6 * 3] == START and copy[1 + 6 * 3 + 2] == 2
        assert pos[1 + 3 * 3 + 3] == 1  # first E1 copy

    def test_simple_grammar(self):
        kind, pos, _ = classify_states(7)
        assert kind[0] == INTERGENIC
        assert list(kind[1:4]) == [INTRON] * 3
        assert list(kind[4:7]) == [EXON] * 3
        assert list(pos[4:7]) == [0, 1, 2]

    def test_ambiguous_requires_flag(self):
        # 1+14*3 = 43 = 1+6*7 parses in both grammars; default is full.
        kind_full, _, _ = classify_states(43)
        kind_simple, _, _ = classify_states(43, simple=True)
        assert (kind_full != INTERGENIC).sum() == 42
        assert (kind_simple == EXON).sum() == 21

    def test_invalid(self):
        with pytest.raises(ValueError):
            classify_states(16)


class TestPathsToGenes:
    def test_single_intronless_gene(self):
        # Ir Ir START E1 E2 E0 E1 STOP Ir  (two codons: START..E1 + E2..STOP)
        path = [Ir, Ir, ST, E1, E2, E0, E1, SP, Ir]
        (g,) = paths_to_genes(path, num_states=15)
        assert (g.start, g.end) == (2, 8)
        assert not g.partial_5p and not g.partial_3p
        assert g.cds == [(2, 8, 0)]
        assert g.introns == []

    def test_gene_with_intron_and_phase(self):
        # START E1 EI1 [I1 x4] IE1 E1 STOP : codon positions
        # 0 1 2 | intron | 0 1 2 — six coding bases, two codons.
        path = [Ir, ST, E1, EI1, I1, I1, I1, I1, IE1, E1, SP, Ir]
        (g,) = paths_to_genes(path, num_states=15)
        assert (g.start, g.end) == (1, 11)
        assert g.cds == [(1, 4, 0), (8, 11, 0)]
        assert g.introns == [(4, 8)]

    def test_phase_nonzero(self):
        # Intron after codon position 0: E0 -> EI0(pos 1) -> I0 -> IE0(pos 2)
        # -> E0. Second CDS segment starts at codon position 2 -> phase 1.
        path = [ST, E1, E2, E0, EI0, I0, I0, IE0, E0, E1, SP]
        (g,) = paths_to_genes(path, num_states=15)
        assert g.cds == [(0, 5, 0), (7, 11, 1)]
        assert g.introns == [(5, 7)]

    def test_window_truncated_gene(self):
        # Path enters the window mid-gene (no START) and leaves mid-gene.
        path = [E2, E0, E1, EI1, I1, I1]
        (g,) = paths_to_genes(path, num_states=15)
        assert g.partial_5p and g.partial_3p
        assert g.cds == [(0, 4, 1)]  # first base at codon position 2
        assert g.introns == [(4, 6)]

    def test_truncated_inside_intron(self):
        path = [I2, I2, IE2, E2, SP]
        (g,) = paths_to_genes(path, num_states=15)
        assert g.partial_5p and not g.partial_3p
        assert g.introns[0] == (0, 2)
        assert g.cds == [(2, 5, 2)]  # IE2 is codon position 1 -> phase 2

    def test_two_genes_offset_and_length(self):
        path = [Ir, ST, E1, SP, Ir, Ir, ST, E1, SP, Ir, Ir, Ir]
        genes = paths_to_genes(path, num_states=15, offset=100, length=9)
        assert [(g.start, g.end) for g in genes] == [(101, 104), (106, 109)]

    def test_all_intergenic(self):
        assert paths_to_genes([Ir] * 8, num_states=15) == []

    def test_multi_copy_attribution(self):
        k = 2
        Irm, start1 = 0, 1 + 6 * k + 1  # START copy 1
        e1_1 = 1 + 3 * k + k + 1  # E1 copy 1
        stop1 = 1 + 13 * k + 1
        path = [Irm, start1, e1_1, stop1, Irm]
        (g,) = paths_to_genes(path, num_states=1 + 14 * k)
        assert g.copy == 1
        assert g.cds == [(1, 4, 0)]

    def test_simple_grammar_genes(self):
        # 7-state: Ir=0, I0-2=1..3, E0-2=4..6. Coding = E runs only.
        path = [0, 4, 5, 6, 1, 1, 4, 5, 6, 0]
        (g,) = paths_to_genes(path, num_states=7)
        # Simple grammar has no START/STOP states: genes are always partial.
        assert g.partial_5p and g.partial_3p
        assert g.cds == [(1, 4, 0), (6, 9, 0)]
        assert g.introns == [(4, 6)]


class TestFlipGenes:
    def test_coordinates_and_strand(self):
        # Gene decoded on the revcomp of a 20-base contig.
        path = [Ir, ST, E1, EI1, I1, I1, IE1, E1, SP, Ir]
        (g,) = paths_to_genes(path, num_states=15)  # revcomp coords (1, 9)
        (f,) = flip_genes([g], contig_length=20)
        assert f.strand == "-"
        assert (f.start, f.end) == (20 - 9, 20 - 1)
        # CDS segments reverse order and flip individually.
        assert f.cds == [(20 - 9, 20 - 6, 0), (20 - 4, 20 - 1, 0)]
        assert f.introns == [(20 - 6, 20 - 4)]
        assert not f.partial_5p and not f.partial_3p

    def test_gff_strand_column(self):
        path = [ST, E1, SP]
        genes = flip_genes(
            paths_to_genes(path, num_states=15), contig_length=10
        )
        lines = genes_to_gff3(genes, "ctg")
        assert all(ln.split("\t")[6] == "-" for ln in lines)
        cols = lines[0].split("\t")
        assert (cols[3], cols[4]) == ("8", "10")


class TestGff3:
    def test_render_and_write(self, tmp_path):
        path = [Ir, ST, E1, EI1, I1, I1, IE1, E1, SP]
        genes = paths_to_genes(path, num_states=15)
        lines = genes_to_gff3(genes, "chr1")
        types = [ln.split("\t")[2] for ln in lines]
        assert types == ["gene", "mRNA", "CDS", "CDS", "intron"]
        gene_row = lines[0].split("\t")
        assert (gene_row[3], gene_row[4]) == ("2", "9")  # 1-based inclusive
        cds_row = lines[2].split("\t")
        assert cds_row[7] == "0" and cds_row[6] == "+"
        assert "Parent=gene1.t1" in lines[2]

        out = tmp_path / "out.gff3"
        n = write_gff3({"chr1": genes, "chr2": []}, out)
        assert n == 1
        text = out.read_text()
        assert text.startswith("##gff-version 3\n")
        assert "chr1\thmm_layer_tpu\tgene\t2\t9" in text

    def test_partial_flag_rendered(self):
        lines = genes_to_gff3(
            [GeneFeature(start=0, end=3, cds=[(0, 3, 1)], partial_5p=True)],
            "ctg",
        )
        assert "partial_5p=true" in lines[0]
        assert lines[2].split("\t")[7] == "1"


class TestRoundTripWithEngine:
    """Decode a planted gene structure with the real 15-state model and
    check the converter recovers it (engine -> annotation integration)."""

    def test_viterbi_to_gff(self):
        import jax
        import jax.numpy as jnp

        from hmm_layer_tpu.layer import HMMLayer
        from hmm_layer_tpu.models import GenePredEmissions, GenePredTransitions

        # Gene with one 4-base intron. Codon positions through the path:
        # ST(0) E1(1) E2(2) E0(0) E1(1) EI1(2) | intron | IE1(0) E1(1) SP(2).
        true_path = np.array(
            [Ir, Ir, ST, E1, E2, E0, E1, EI1, I1, I1, I1, I1, IE1, E1, SP, Ir]
        )
        L = len(true_path)
        nt = "ACGT"
        rng = np.random.default_rng(0)
        bases = [nt[i] for i in rng.integers(0, 4, size=L)]
        bases[2:5] = "ATG"  # start codon at ST(2), E1(3), E2(4)
        bases[8:10] = "GT"  # donor: first two intron bases (t=8,9)
        bases[10:12] = "AG"  # acceptor: last two intron bases (t=10,11)
        bases[12:15] = "TAA"  # stop codon at IE1(12), E1(13), SP(14)
        onehot = np.zeros((L, 5), np.float32)
        for t, b in enumerate(bases):
            onehot[t, nt.index(b)] = 1.0

        # Near-one-hot class probabilities pointing at the true 15 states.
        class_probs = np.full((L, 15), 0.01, np.float32)
        class_probs[np.arange(L), true_path] = 1.0
        class_probs /= class_probs.sum(-1, keepdims=True)
        inputs = jnp.asarray(
            np.concatenate([class_probs, onehot], -1)[None, None]
        )

        from hmm_layer_tpu.models.initializers import (
            make_15_class_emission_kernel,
        )

        layer = HMMLayer(
            GenePredTransitions(),
            GenePredEmissions(
                start_codons=[("ATG", 1.0)],
                stop_codons=[("TAA", 1.0)],
                intron_begin_pattern=[("NGT", 1.0)],
                intron_end_pattern=[("AGN", 1.0)],
                num_copies=1,
                # Smoothed-identity class kernel so the near-one-hot class
                # inputs actually identify states (full 15-row init; the
                # shared-intron rows are sliced out by init_params).
                init=make_15_class_emission_kernel(),
            ),
        )
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=15)
        decoded = np.asarray(layer.viterbi(params, inputs))[0, 0]
        np.testing.assert_array_equal(decoded, true_path)

        (g,) = paths_to_genes(decoded, num_states=15)
        assert (g.start, g.end) == (2, 15)
        assert g.cds == [(2, 8, 0), (12, 15, 0)]
        assert g.introns == [(8, 12)]
        assert not g.partial_5p and not g.partial_3p


class TestGenesToStates:
    """genes_to_states is the exact inverse of paths_to_genes on
    grammar-valid paths (the supervised label-generation contract)."""

    VALID_PATHS_15 = [
        # intronless complete gene
        [Ir, Ir, ST, E1, E2, E0, E1, SP, Ir],
        # one intron, phase 0 at the second segment
        [Ir, ST, E1, EI1, I1, I1, I1, I1, IE1, E1, SP, Ir],
        # intron after codon position 0
        [ST, E1, E2, E0, EI0, I0, I0, IE0, E0, E1, SP],
        # window-truncated on both sides
        [E2, E0, E1, EI1, I1, I1],
        # truncated entering mid-intron (grammar-valid continuation:
        # IE2 has codon position 1, so E2(2) E0(0) E1(1) SP(2) follows)
        [I2, I2, IE2, E2, E0, E1, SP],
        # two genes
        [Ir, ST, E1, SP, Ir, Ir, ST, E1, SP, Ir, Ir, Ir],
        # all intergenic
        [Ir] * 6,
    ]

    def test_round_trip_full_grammar(self):
        from hmm_layer_tpu.models.annotation import genes_to_states

        for path in self.VALID_PATHS_15:
            path = np.asarray(path)
            genes = paths_to_genes(path, num_states=15)
            track = genes_to_states(genes, len(path), num_states=15)
            np.testing.assert_array_equal(track, path, err_msg=str(path))

    def test_round_trip_with_offset(self):
        from hmm_layer_tpu.models.annotation import genes_to_states

        path = np.asarray([Ir, ST, E1, EI1, I1, I1, IE1, E1, SP, Ir])
        genes = paths_to_genes(path, num_states=15, offset=1000)
        track = genes_to_states(genes, len(path), num_states=15, offset=1000)
        np.testing.assert_array_equal(track, path)

    def test_round_trip_simple_grammar(self):
        from hmm_layer_tpu.models.annotation import genes_to_states

        # E0 E1 E2 -> I2 -> E0 E1 E2 (I2 -> E0 is the grammar edge)
        path = np.asarray([0, 4, 5, 6, 3, 3, 4, 5, 6, 0])
        genes = paths_to_genes(path, num_states=7)
        track = genes_to_states(genes, len(path), num_states=7)
        np.testing.assert_array_equal(track, path)

    def test_round_trip_multi_copy(self):
        from hmm_layer_tpu.models.annotation import genes_to_states

        k = 2
        start1 = 1 + 6 * k + 1
        e1_1 = 1 + 3 * k + k + 1
        stop1 = 1 + 13 * k + 1
        path = np.asarray([0, start1, e1_1, stop1, 0])
        genes = paths_to_genes(path, num_states=1 + 14 * k)
        track = genes_to_states(genes, len(path), num_states=1 + 14 * k)
        np.testing.assert_array_equal(track, path)

    def test_minus_strand_raises(self):
        from hmm_layer_tpu.models.annotation import genes_to_states

        g = GeneFeature(start=0, end=3, cds=[(0, 3, 0)], strand="-")
        with pytest.raises(ValueError, match="flip_genes"):
            genes_to_states([g], 3)

    def test_minus_strand_via_flip_involution(self):
        """Label a minus-strand gene by flipping back to revcomp space."""
        from hmm_layer_tpu.models.annotation import genes_to_states

        rc_path = np.asarray([Ir, ST, E1, EI1, I1, I1, IE1, E1, SP, Ir])
        Lc = len(rc_path)
        minus = flip_genes(paths_to_genes(rc_path, num_states=15), Lc)
        back = flip_genes(minus, Lc)  # involution -> revcomp space, '+'
        for g in back:
            g.strand = "+"
        track = genes_to_states(back, Lc, num_states=15)
        np.testing.assert_array_equal(track, rc_path)

    def test_inconsistent_phase_chain_raises(self):
        from hmm_layer_tpu.models.annotation import genes_to_states

        g = GeneFeature(
            start=0, end=8,
            cds=[(0, 3, 0), (5, 8, 0)],  # second phase should be 0 only
            introns=[(3, 5)],            # if length(first) % 3 == 0: ok
        )
        # first segment length 3 -> phase 0 chains; make it inconsistent:
        g.cds[1] = (5, 8, 1)
        with pytest.raises(ValueError, match="chain"):
            genes_to_states([g], 8)

    def test_non_codon_multiple_complete_gene_raises(self):
        from hmm_layer_tpu.models.annotation import genes_to_states

        g = GeneFeature(start=0, end=4, cds=[(0, 4, 0)])
        with pytest.raises(ValueError, match="codon"):
            genes_to_states([g], 4)

    def test_intron_only_fragment_raises(self):
        from hmm_layer_tpu.models.annotation import genes_to_states

        g = GeneFeature(start=0, end=4, introns=[(0, 4)], partial_5p=True,
                        partial_3p=True)
        with pytest.raises(ValueError, match="intron"):
            genes_to_states([g], 4)


class TestReadGff3:
    def test_write_read_round_trip(self, tmp_path):
        path = np.asarray([Ir, ST, E1, EI1, I1, I1, IE1, E1, SP, Ir])
        genes = paths_to_genes(path, num_states=15)
        genes += flip_genes(paths_to_genes([ST, E1, SP], num_states=15), 10)
        out = tmp_path / "x.gff3"
        write_gff3({"chr1": genes, "chr2": []}, out)

        from hmm_layer_tpu.models.annotation import read_gff3

        back = read_gff3(out)
        assert list(back) == ["chr1"]
        assert len(back["chr1"]) == len(genes)
        for a, b in zip(genes, back["chr1"]):
            assert (a.start, a.end, a.strand) == (b.start, b.end, b.strand)
            assert a.cds == b.cds and a.introns == b.introns
            assert (a.partial_5p, a.partial_3p) == (b.partial_5p, b.partial_3p)

    def test_foreign_gff3(self, tmp_path):
        """No mRNA indirection, no intron rows, '.' phases, extra types."""
        text = "\n".join([
            "##gff-version 3",
            "ctg\tsrc\tregion\t1\t100\t.\t+\t.\tID=r1",
            "ctg\tsrc\tgene\t11\t40\t.\t+\t.\tID=gA",
            "ctg\tsrc\tCDS\t11\t20\t.\t+\t0\tParent=gA",
            "ctg\tsrc\tCDS\t31\t40\t.\t+\t.\tParent=gA",
            "",
        ])
        p = tmp_path / "f.gff3"
        p.write_text(text)

        from hmm_layer_tpu.models.annotation import read_gff3

        (g,) = read_gff3(p)["ctg"]
        assert (g.start, g.end) == (10, 40)
        assert g.cds == [(10, 20, 0), (30, 40, 0)]
        assert g.introns == [(20, 30)]  # derived from the CDS gap

    def test_second_transcript_skipped(self, tmp_path):
        text = "\n".join([
            "##gff-version 3",
            "ctg\tsrc\tgene\t1\t30\t.\t+\t.\tID=g1",
            "ctg\tsrc\tmRNA\t1\t30\t.\t+\t.\tID=t1;Parent=g1",
            "ctg\tsrc\tmRNA\t1\t30\t.\t+\t.\tID=t2;Parent=g1",
            "ctg\tsrc\tCDS\t1\t9\t.\t+\t0\tParent=t1",
            "ctg\tsrc\tCDS\t1\t12\t.\t+\t0\tParent=t2",
            "",
        ])
        p = tmp_path / "t.gff3"
        p.write_text(text)

        from hmm_layer_tpu.models.annotation import read_gff3

        (g,) = read_gff3(p)["ctg"]
        assert g.cds == [(0, 9, 0)]


class TestEvaluateAnnotation:
    def test_perfect_match(self):
        from hmm_layer_tpu.models.annotation import evaluate_annotation

        genes = paths_to_genes(
            [Ir, ST, E1, EI1, I1, I1, IE1, E1, SP, Ir], num_states=15
        )
        m = evaluate_annotation({"c": genes}, {"c": genes})
        for level in ("nucleotide", "exon", "gene"):
            assert m[level]["f1"] == 1.0 and m[level]["fp"] == 0

    def test_shifted_exon(self):
        from hmm_layer_tpu.models.annotation import evaluate_annotation

        true = [GeneFeature(start=0, end=9, cds=[(0, 9, 0)])]
        pred = [GeneFeature(start=3, end=12, cds=[(3, 12, 0)])]
        m = evaluate_annotation({"c": pred}, {"c": true})
        assert m["exon"]["f1"] == 0.0 and m["gene"]["f1"] == 0.0
        assert m["nucleotide"]["tp"] == 6
        assert m["nucleotide"]["fp"] == 3 and m["nucleotide"]["fn"] == 3

    def test_strand_mismatch_never_matches(self):
        from hmm_layer_tpu.models.annotation import evaluate_annotation

        plus = [GeneFeature(start=0, end=3, cds=[(0, 3, 0)], strand="+")]
        minus = [GeneFeature(start=0, end=3, cds=[(0, 3, 0)], strand="-")]
        m = evaluate_annotation({"c": plus}, {"c": minus})
        assert m["nucleotide"]["tp"] == 0

    def test_empty_prediction(self):
        from hmm_layer_tpu.models.annotation import evaluate_annotation

        true = [GeneFeature(start=0, end=3, cds=[(0, 3, 0)])]
        m = evaluate_annotation({"c": []}, {"c": true})
        assert m["gene"]["recall"] == 0.0 and m["gene"]["fn"] == 1
