"""Gene-structure annotation (GFF3) from gene-prediction Viterbi paths.

The gene-pred model family's end deliverable (the Tiberius pipeline the
reference transcribes its HMM head from) is a genome annotation: the most
likely state path through the 15-state grammar mapped to gene/CDS/intron
intervals. The reference repo stops at the posterior/state-path level
(``/root/reference/hmm_layer/gene_pred_hmm_emitter.py`` scores states;
nothing consumes the decoded path), so — symmetrically to
:mod:`hmm_layer_tpu.models.msa` on the learnMSA side — the converter ships
here as a small NumPy post-processing step over
:meth:`~hmm_layer_tpu.layer.HMMLayer.viterbi` output.

State semantics (derived from the grammar and the codon-pattern pivots in
:mod:`~hmm_layer_tpu.models.gene_pred_emissions`):

* ``Ir`` — intergenic.
* ``I0-2`` — intron positions (phase = codon position interrupted).
* ``E0-2`` — exon position at codon position 0/1/2.
* ``START`` — first base of the start codon (left-pivot ``ATG`` window).
* ``EI0-2`` — LAST exon base before an intron (the left-pivot ``NGT``
  donor window constrains the two FOLLOWING bases); codon position
  ``(i+1) % 3``.
* ``IE0-2`` — FIRST exon base after an intron (the right-pivot ``AGN``
  acceptor window constrains the two PRECEDING bases); codon position
  ``(i+2) % 3``.
* ``STOP`` — last base of the stop codon (right-pivot stop window).

Coding positions are therefore ``{START, E*, EI*, IE*, STOP}`` and intron
positions are the ``I*`` runs between an ``EI``/``IE`` pair. GFF3 ``phase``
is computed from the codon position of a CDS segment's first base
(``phase = (3 - codon_pos) % 3``).

Both gene-pred grammars are supported: the 15-state / ``1+14k``-state
family (``GenePredTransitions`` / ``GenePredMultiTransitions`` state
order) and the 7-state / ``1+6k``-state simple family (no
START/EI/IE/STOP states; every coding state is an ``E``). Windows decoded
at an offset into a longer contig pass ``offset`` so coordinates land in
contig space.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "GeneFeature",
    "classify_states",
    "flip_genes",
    "paths_to_genes",
    "genes_to_gff3",
    "write_gff3",
]

# Row indices of the classification table.
INTERGENIC, INTRON, EXON, START, EI, IE, STOP = range(7)
_KIND_NAMES = ("Ir", "I", "E", "START", "EI", "IE", "STOP")


def classify_states(num_states: int, simple: bool | None = None):
    """Per-state ``(kind, codon_pos, copy)`` tables for a gene-pred grammar.

    Args:
      num_states: ``1 + 14k`` (full grammar) or ``1 + 6k`` (simple grammar).
      simple: force the simple grammar; by default inferred from
        ``num_states`` (``1+6k`` vs ``1+14k`` are ambiguous only at
        ``k≡0 (mod 7)`` multiples where both parse — there the full grammar
        wins and ``simple=True`` must be passed explicitly).

    Returns:
      ``(kind, codon_pos, copy)`` int arrays of shape ``(num_states,)``.
      ``codon_pos`` is -1 for non-coding states; for introns it carries the
      interrupted phase instead.
    """
    if simple is None:
        simple = (num_states - 1) % 14 != 0
    div = 6 if simple else 14
    if num_states < 1 + div or (num_states - 1) % div != 0:
        raise ValueError(
            f"num_states={num_states} is not 1+{div}k for any k >= 1"
        )
    k = (num_states - 1) // div
    kind = np.full(num_states, INTERGENIC, np.int32)
    codon_pos = np.full(num_states, -1, np.int32)
    copy = np.zeros(num_states, np.int32)

    def block(start, knd, pos_of):
        """Three k-wide phase blocks starting at ``start``."""
        for phase in range(3):
            sl = slice(start + phase * k, start + (phase + 1) * k)
            kind[sl] = knd
            codon_pos[sl] = pos_of(phase)
            copy[sl] = np.arange(k)

    block(1, INTRON, lambda i: i)
    block(1 + 3 * k, EXON, lambda i: i)
    if not simple:
        kind[1 + 6 * k : 1 + 7 * k] = START
        codon_pos[1 + 6 * k : 1 + 7 * k] = 0
        copy[1 + 6 * k : 1 + 7 * k] = np.arange(k)
        block(1 + 7 * k, EI, lambda i: (i + 1) % 3)
        block(1 + 10 * k, IE, lambda i: (i + 2) % 3)
        kind[1 + 13 * k :] = STOP
        codon_pos[1 + 13 * k :] = 2
        copy[1 + 13 * k :] = np.arange(k)
    return kind, codon_pos, copy


@dataclass
class GeneFeature:
    """One predicted gene: CDS segments and introns in contig coordinates.

    Coordinates are 0-based half-open internally; :func:`genes_to_gff3`
    renders the 1-based inclusive GFF3 convention. ``partial_5p`` /
    ``partial_3p`` flag genes truncated by the window (no START seen /
    no STOP seen).
    """

    start: int
    end: int
    cds: list = field(default_factory=list)  # [(start, end, phase)]
    introns: list = field(default_factory=list)  # [(start, end)]
    copy: int = 0
    partial_5p: bool = False
    partial_3p: bool = False
    strand: str = "+"


def paths_to_genes(
    path,
    num_states: int | None = None,
    offset: int = 0,
    length: int | None = None,
    simple: bool | None = None,
) -> list[GeneFeature]:
    """Extract gene structures from ONE decoded state path.

    Args:
      path: ``(L,)`` int array of Viterbi states (gene-pred state order).
      num_states: grammar size; default ``max(path) + 1`` rounded up to a
        valid ``1+14k`` (pass explicitly for small windows that never visit
        the last states).
      offset: contig coordinate of ``path[0]``.
      length: true (unpadded) window length; positions beyond it are
        ignored.
      simple: see :func:`classify_states`.

    Returns:
      list of :class:`GeneFeature`, in order of genomic start. A gene is a
      maximal run of non-intergenic states; its CDS segments are maximal
      runs of coding states, its introns the ``I`` runs between them.
    """
    path = np.asarray(path)
    if path.ndim != 1:
        raise ValueError(f"path must be 1-D, got shape {path.shape}")
    if length is not None:
        path = path[: int(length)]
    if num_states is None:
        hi = int(path.max(initial=0))
        num_states = 1 + 14 * max(1, -(-hi // 14))  # round up to 1+14k
    kind_tab, pos_tab, copy_tab = classify_states(num_states, simple=simple)
    kinds = kind_tab[path]
    genic = kinds != INTERGENIC
    if not genic.any():
        return []
    # Boundaries of maximal genic runs.
    edges = np.flatnonzero(np.diff(genic.astype(np.int8)))
    starts = ([0] if genic[0] else []) + list(edges[~genic[edges]] + 1)
    ends = list(edges[genic[edges]] + 1) + ([len(path)] if genic[-1] else [])

    genes = []
    coding = (kinds == EXON) | (kinds == START) | (kinds == EI) | \
        (kinds == IE) | (kinds == STOP)
    for g0, g1 in zip(starts, ends):
        gene = GeneFeature(
            start=offset + g0,
            end=offset + g1,
            copy=int(copy_tab[path[g0]]),
            partial_5p=kind_tab[path[g0]] != START,
            partial_3p=kind_tab[path[g1 - 1]] != STOP,
        )
        in_cds = coding[g0:g1]
        if not in_cds.any():  # window truncated inside an intron
            gene.introns.append((offset + g0, offset + g1))
            genes.append(gene)
            continue
        e = np.flatnonzero(np.diff(in_cds.astype(np.int8)))
        c_starts = ([0] if in_cds[0] else []) + list(e[~in_cds[e]] + 1)
        c_ends = list(e[in_cds[e]] + 1) + ([g1 - g0] if in_cds[-1] else [])
        for c0, c1 in zip(c_starts, c_ends):
            cp = int(pos_tab[path[g0 + c0]])
            phase = 0 if cp < 0 else (3 - cp) % 3
            gene.cds.append((offset + g0 + c0, offset + g0 + c1, phase))
        for i0, i1 in zip(c_ends[:-1], c_starts[1:]):
            gene.introns.append((offset + g0 + i0, offset + g0 + i1))
        # Intron runs touching the gene boundary (possible only for
        # window-truncated genes) are kept out of cds but recorded too.
        if c_starts and c_starts[0] > 0:
            gene.introns.insert(0, (offset + g0, offset + g0 + c_starts[0]))
        if c_ends and c_ends[-1] < g1 - g0:
            gene.introns.append((offset + g0 + c_ends[-1], offset + g1))
        genes.append(gene)
    return genes


def flip_genes(genes, contig_length: int) -> list[GeneFeature]:
    """Map genes decoded on a REVERSE-COMPLEMENTED contig back to forward
    coordinates (strand ``-``).

    The decoder sees the reverse complement, so a feature at revcomp
    half-open ``[s, e)`` sits at forward ``[Lc - e, Lc - s)``. GFF3 phase
    for minus-strand CDS is counted from the feature's strand-wise start
    (the higher forward coordinate) — exactly the phase already computed in
    revcomp space, so phases carry over unchanged. 5'/3' partial flags
    refer to the gene's own orientation and carry over too.
    """
    out = []
    for g in genes:
        Lc = int(contig_length)
        out.append(
            GeneFeature(
                start=Lc - g.end,
                end=Lc - g.start,
                cds=[(Lc - e, Lc - s, p) for s, e, p in reversed(g.cds)],
                introns=[(Lc - e, Lc - s) for s, e in reversed(g.introns)],
                copy=g.copy,
                partial_5p=g.partial_5p,
                partial_3p=g.partial_3p,
                strand="-",
            )
        )
    out.sort(key=lambda g: g.start)
    return out


def genes_to_gff3(
    genes,
    seqid: str,
    source: str = "hmm_layer_tpu",
    gene_prefix: str = "gene",
    start_index: int = 1,
) -> list[str]:
    """Render :class:`GeneFeature` records as GFF3 lines (no header)."""
    lines = []
    for n, g in enumerate(genes, start=start_index):
        gid = f"{gene_prefix}{n}"
        attrs = [f"ID={gid}"]
        if g.copy:
            attrs.append(f"copy={g.copy}")
        if g.partial_5p:
            attrs.append("partial_5p=true")
        if g.partial_3p:
            attrs.append("partial_3p=true")

        def row(ftype, s, e, phase=".", parent=None, fid=None):
            a = []
            if fid:
                a.append(f"ID={fid}")
            if parent:
                a.append(f"Parent={parent}")
            return (
                f"{seqid}\t{source}\t{ftype}\t{s + 1}\t{e}\t.\t{g.strand}\t"
                f"{phase}\t" + ";".join(a or attrs)
            )

        lines.append(row("gene", g.start, g.end))
        lines.append(
            row("mRNA", g.start, g.end, parent=gid, fid=f"{gid}.t1")
        )
        for s, e, phase in g.cds:
            lines.append(row("CDS", s, e, phase=phase, parent=f"{gid}.t1"))
        for s, e in g.introns:
            lines.append(row("intron", s, e, parent=f"{gid}.t1"))
    return lines


def write_gff3(genes_by_seq, path, source: str = "hmm_layer_tpu"):
    """Write ``{seqid: [GeneFeature, ...]}`` to a GFF3 file."""
    n = 0
    with open(path, "w") as fh:
        fh.write("##gff-version 3\n")
        for seqid, genes in genes_by_seq.items():
            for line in genes_to_gff3(
                genes, seqid, source=source, start_index=n + 1
            ):
                fh.write(line + "\n")
            n += len(genes)
    return n
