"""Variant-major columnar view: the device-ready transposed population.

Capability parity with VariantDBVariant / AlleleSummmary
(kgl_variant_db/kgl_variant_db_variant.h:26-83): variant index x genome
zygosity codes {0 = absent, 1 = heterozygous, 2 = homozygous} plus
per-variant and per-genome allele summaries. In the TPU build this *is* the
compute format: the zygosity matrix ships to the device once and every
population statistic (AF, het/hom, FWS, inbreeding) is a batched reduction
over it (vmap/shard_map instead of the reference's per-genome thread pool).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from .db import PopulationDB

__all__ = ["AlleleSummary", "VariantMajorView"]


@dataclass
class AlleleSummary:
    """Het/hom counts (AlleleSummmary in the reference — including its
    spelling's meaning, not its spelling)."""

    heterozygous: int = 0
    homozygous: int = 0

    def __iadd__(self, other: "AlleleSummary"):
        self.heterozygous += other.heterozygous
        self.homozygous += other.homozygous
        return self

    @property
    def total(self) -> int:
        return self.heterozygous + self.homozygous


class VariantMajorView:
    """Transpose a PopulationDB into variant-major arrays."""

    def __init__(self, population: PopulationDB):
        self.population = population
        self.genome_ids: List[str] = sorted(population.genome_map)
        genome_index = {g: i for i, g in enumerate(self.genome_ids)}

        # Collect the distinct arena rows present, sorted by (contig, offset).
        rows_present: Dict[int, int] = {}
        arena = population.arena
        pairs: List[Tuple[int, int]] = []  # (genome_idx, arena_row) per incidence
        for gid, genome in population.genome_map.items():
            gidx = genome_index[gid]
            for _, contig in genome.contig_map.items():
                cols = contig.columns()
                for row in cols["row"]:
                    pairs.append((gidx, int(row)))
        unique_rows = sorted(
            set(r for _, r in pairs),
            key=lambda r: (int(arena.contigs[r]), int(arena.offsets[r])),
        )
        self.rows = np.asarray(unique_rows, dtype=np.int64)
        row_pos = {r: i for i, r in enumerate(unique_rows)}

        # Zygosity: incidence count per (genome, variant), clamped to 2.
        n_g, n_v = len(self.genome_ids), len(unique_rows)
        self.zygosity = np.zeros((n_g, n_v), dtype=np.uint8)
        for gidx, row in pairs:
            v = row_pos[row]
            if self.zygosity[gidx, v] < 2:
                self.zygosity[gidx, v] += 1

        # Variant coordinate columns (device-ready).
        self.contig_index = arena.contigs[self.rows]
        self.offsets = arena.offsets[self.rows]
        self.hgvs = [arena.hgvs(int(r)) for r in self.rows]

    # ------------------------------------------------------------------ #
    @property
    def genome_count(self) -> int:
        return len(self.genome_ids)

    @property
    def variant_count(self) -> int:
        return len(self.rows)

    # --- summaries (summaryByVariant / summaryByGenome) -------------------
    def summary_by_variant(self, index: int) -> AlleleSummary:
        col = self.zygosity[:, index]
        return AlleleSummary(
            heterozygous=int(np.sum(col == 1)), homozygous=int(np.sum(col == 2))
        )

    def summary_by_genome(self, genome_id: str) -> AlleleSummary:
        row = self.zygosity[self.genome_ids.index(genome_id)]
        return AlleleSummary(
            heterozygous=int(np.sum(row == 1)), homozygous=int(np.sum(row == 2))
        )

    # --- bulk columns ------------------------------------------------------
    def het_hom_by_variant(self) -> Tuple[np.ndarray, np.ndarray]:
        return (
            np.sum(self.zygosity == 1, axis=0),
            np.sum(self.zygosity == 2, axis=0),
        )

    def het_hom_by_genome(self) -> Tuple[np.ndarray, np.ndarray]:
        return (
            np.sum(self.zygosity == 1, axis=1),
            np.sum(self.zygosity == 2, axis=1),
        )

    def alt_allele_counts(self) -> np.ndarray:
        """AC per variant (het counts 1, hom counts 2)."""
        return np.sum(self.zygosity, axis=0, dtype=np.int64)

    def allele_number(self) -> int:
        """AN: two allele draws per diploid genome."""
        return 2 * self.genome_count

    def allele_frequencies(self) -> np.ndarray:
        """AF per variant from the population itself."""
        an = self.allele_number()
        return self.alt_allele_counts() / an if an else np.zeros(self.variant_count)
