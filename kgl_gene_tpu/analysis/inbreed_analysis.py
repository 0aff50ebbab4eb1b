"""INBREED analysis: per-sample inbreeding coefficients.

Capability parity with InbreedAnalysis (kga_analytic/kga_inbreed/, 3,835
LoC): allele-class frequencies from super-population AF, the four
estimation algorithms (Ritland locus, Simple, Hall EM, MLE), locus windows
by AF bins, synthetic validation, and column/CSV output. The estimators
themselves are the vmapped device reductions in
kgl_gene_tpu.stats.inbreeding; this plugin assembles the locus data from
the population and writes the report.

Parameters: Algorithm (RitlandLocus|Simple|HallME|Loglikelihood|ALL),
SuperPopulation (AF field dialect selector), MinAF/MaxAF (locus window).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..app.analysis import VirtualAnalysis, register_analysis
from ..stats.frequency import FrequencyDatabaseRead
from ..stats.inbreeding import LocusData, inbreeding_all, _ESTIMATORS
from ..utils.logging import log
from ..variant.columnar import VariantMajorView

__all__ = ["InbreedAnalysis"]


@register_analysis
class InbreedAnalysis(VirtualAnalysis):
    ANALYSIS_IDENT = "INBREED"

    def __init__(self):
        self.work_directory = "."
        self.algorithm = "ALL"
        self.super_population = "ALL"
        self.min_af = 0.0
        self.max_af = 1.0
        self.results: Dict[str, Dict[str, float]] = {}  # genome -> algo -> F

    def initialize_analysis(self, work_directory, parameters, resources) -> bool:
        self.work_directory = work_directory
        for block in parameters:
            self.algorithm = block.value("Algorithm", self.algorithm)
            self.super_population = block.value("SuperPopulation", self.super_population)
            self.min_af = float(block.value("MinAF", str(self.min_af)))
            self.max_af = float(block.value("MaxAF", str(self.max_af)))
        if self.algorithm != "ALL" and self.algorithm not in _ESTIMATORS:
            log().error("INBREED: unknown algorithm {}", self.algorithm)
            return False
        return True

    def _locus_data(self, population) -> Optional[LocusData]:
        view = VariantMajorView(population)
        if view.variant_count == 0:
            return None
        info = getattr(population, "info_store", None)
        minor_freq = None
        if info is not None:
            freq_read = FrequencyDatabaseRead(info)
            info_rows = np.array(
                [population.arena.info_row(int(r)) for r in view.rows], dtype=np.int64
            )
            column = freq_read.frequency_column(self.super_population)
            if column is not None:
                safe = np.clip(info_rows, 0, len(column) - 1)
                minor_freq = np.where(info_rows >= 0, column[safe], np.nan)
        if minor_freq is None:
            # Fall back to frequencies from the population itself.
            minor_freq = view.allele_frequencies()
        minor_freq = np.nan_to_num(np.asarray(minor_freq, dtype=np.float64), nan=0.0)
        # Locus window by AF bin (locus selection, kga_analysis_inbreed_locus.h).
        window = (minor_freq >= self.min_af) & (minor_freq <= self.max_af)
        # Restrict to SNP loci (the estimators' model).
        snp = population.arena.is_snp_column()[view.rows]
        valid = np.broadcast_to((window & snp & (minor_freq > 0) & (minor_freq < 1)),
                                view.zygosity.shape).copy()
        data = LocusData(zygosity=view.zygosity, minor_freq=minor_freq, valid=valid)
        data.genome_ids = view.genome_ids  # type: ignore[attr-defined]
        return data

    def file_read_analysis(self, population) -> bool:
        data = self._locus_data(population)
        if data is None:
            log().warn("INBREED: no variants in population")
            return True
        if self.algorithm == "ALL":
            results = inbreeding_all(data)
        else:
            from ..stats.inbreeding import _estimate

            results = {self.algorithm: _estimate(self.algorithm, data)}
        for g, genome_id in enumerate(data.genome_ids):  # type: ignore[attr-defined]
            row = self.results.setdefault(genome_id, {})
            for algo, values in results.items():
                row[algo] = float(values[g])
        return True

    def finalize_analysis(self) -> bool:
        path = os.path.join(self.work_directory, "inbreeding.csv")
        algos = sorted(_ESTIMATORS) if self.algorithm == "ALL" else [self.algorithm]
        with open(path, "w") as f:
            f.write("Genome," + ",".join(algos) + "\n")
            for genome_id in sorted(self.results):
                row = self.results[genome_id]
                f.write(
                    genome_id + ","
                    + ",".join(f"{row.get(a, 0.0):.6f}" for a in algos) + "\n"
                )
        log().info("INBREED: {} genomes written to {}", len(self.results), path)
        return True
