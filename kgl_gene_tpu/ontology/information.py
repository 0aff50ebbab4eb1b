"""Term information content over the annotated DAG.

Capability parity with InformationContent/InformationContentDAG
(kol_ontology/kol_InformationContent.cpp:15-77,
kol_InformationContentImpl.cpp:39-180): cumulative annotation counts over
each term's self+descendant SET, probability = count / namespace-root
count, IC = -ln(p), per-namespace max IC, and MICA shared information —
all computed as vectorized array ops: the cumulative counts are one
bitset-matrix x count-vector product instead of per-term set walks.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence, Set

import numpy as np

from .annotation import TermAnnotation
from .graph import GoGraph
from .obo import NAMESPACES

__all__ = ["InformationContent"]

BAD_INFO_VALUE = 0.0


class InformationContent:
    def __init__(self, graph: GoGraph, annotation: TermAnnotation):
        self.graph = graph
        counts = annotation.annotation_count_vector(graph)

        # Cumulative annotations: for each term, sum of direct counts over
        # its self+descendant set. Vectorized via the descendant bitsets:
        # unpack each 64-bit word lane against the count vector.
        desc = graph.descendant_bitsets()  # (n, words) uint64
        n = len(graph)
        bits = np.unpackbits(
            desc.view(np.uint8), axis=1, bitorder="little"
        )[:, :n]  # (n, n) 0/1
        self.cumulative_counts = bits.astype(np.float64) @ counts

        # Namespace root counts.
        self.root_counts = np.ones(3, dtype=np.float64)
        for ns_code, namespace in enumerate(NAMESPACES):
            root = graph.root_index(namespace)
            if root is not None and self.cumulative_counts[root] > 0:
                self.root_counts[ns_code] = self.cumulative_counts[root]

        ns_code = graph.namespace_code.astype(np.int64)
        root_for_term = self.root_counts[np.clip(ns_code, 0, 2)]
        with np.errstate(divide="ignore"):
            prob = self.cumulative_counts / root_for_term
            ic = np.where(prob > 0, -np.log(prob), BAD_INFO_VALUE)
        ic = np.where(ns_code >= 0, ic, BAD_INFO_VALUE)
        self.ic = ic

        # Per-namespace max IC (convertProbtoIC max tracking).
        self.max_ic = np.zeros(3, dtype=np.float64)
        for code in range(3):
            mask = (ns_code == code) & (self.cumulative_counts > 0)
            if mask.any():
                self.max_ic[code] = float(ic[mask].max())

    # ------------------------------------------------------------------ #
    def term_information(self, term_id: str) -> float:
        idx = self.graph.term_index(term_id)
        if idx is None or self.cumulative_counts[idx] <= 0:
            return BAD_INFO_VALUE
        return float(self.ic[idx])

    def max_information_content(self, term_id: str) -> float:
        idx = self.graph.term_index(term_id)
        if idx is None:
            return 0.0
        code = int(self.graph.namespace_code[idx])
        return float(self.max_ic[code]) if code >= 0 else 0.0

    def validate_terms(self, term_a: str, term_b: str) -> bool:
        ia = self.graph.term_index(term_a)
        ib = self.graph.term_index(term_b)
        if ia is None or ib is None:
            return False
        if self.cumulative_counts[ia] <= 0 or self.cumulative_counts[ib] <= 0:
            return False
        return self.graph.namespace_code[ia] == self.graph.namespace_code[ib]

    def shared_information(self, term_a: str, term_b: str) -> float:
        """IC of the Most Informative Common Ancestor (MICA)."""
        ia = self.graph.term_index(term_a)
        ib = self.graph.term_index(term_b)
        if ia is None or ib is None:
            return 0.0
        anc = self.graph.ancestor_bitsets()
        common = anc[ia] & anc[ib]
        if not common.any():
            return 0.0
        idxs = GoGraph._bits_to_indices(common)
        return float(self.ic[idxs].max()) if len(idxs) else 0.0

    # --- vectorized all-pairs MICA (the TPU cache feed) -------------------
    def mica_matrix(self, term_indices: Sequence[int]) -> np.ndarray:
        """MICA IC for every pair in a term subset: (k, k) float64.

        Computed blockwise from the ancestor bitsets with the IC applied as
        a weight on unpacked bit-planes (max-reduce over ancestors).
        """
        term_indices = np.asarray(term_indices, dtype=np.int64)
        anc = self.graph.ancestor_bitsets()[term_indices]  # (k, words)
        n = len(self.graph)
        bits = np.unpackbits(anc.view(np.uint8), axis=1, bitorder="little")[:, :n]
        weighted = bits.astype(np.float64) * self.ic[None, :]
        k = len(term_indices)
        out = np.zeros((k, k), dtype=np.float64)
        block = 256
        for start in range(0, k, block):
            rows = weighted[start : start + block]  # (b, n)
            # pairwise min(a_w, b_w) then max over ancestors == max over
            # ancestors present in BOTH (weights equal per ancestor).
            for jstart in range(0, k, block):
                cols = weighted[jstart : jstart + block]
                pair_min = np.minimum(rows[:, None, :], cols[None, :, :])
                out[start : start + block, jstart : jstart + block] = pair_min.max(axis=2)
        return out
