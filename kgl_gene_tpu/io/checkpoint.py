"""Ingest checkpoint / resume.

The reference has no checkpointing (runs re-execute from XML; SURVEY.md
section 5) — the only adjacent mechanisms are the PubMed disk cache and
precomputed similarity matrices. For a TPU fleet the failure-recovery
equivalent is a *deterministic ingest cursor*: record (file, line number,
counts, content fingerprint) as parsing proceeds so an interrupted ingest
resumes by skipping already-processed records and re-verifying the prefix
fingerprint, plus whole-population columnar snapshots (save/load) so
analyses restart from the parsed state instead of the raw VCF.
"""

from __future__ import annotations

import json
import os
import pickle
from dataclasses import asdict, dataclass
from typing import Optional

from ..utils.logging import log
from ..utils.string_hash import combine_hash, string_hash

__all__ = ["IngestCursor", "save_population", "load_population"]


@dataclass
class IngestCursor:
    """Resumable position in a VCF ingest."""

    file_path: str
    line_number: int = 0
    record_count: int = 0
    variant_count: int = 0
    fingerprint: int = 0  # rolling hash of processed record keys

    def advance(self, record_key: str, variants_added: int) -> None:
        self.line_number += 1
        self.record_count += 1
        self.variant_count += variants_added
        self.fingerprint = combine_hash(self.fingerprint, string_hash(record_key))

    # --- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(asdict(self), f)

    @classmethod
    def load(cls, path: str) -> Optional["IngestCursor"]:
        if not os.path.isfile(path):
            return None
        try:
            with open(path) as f:
                return cls(**json.load(f))
        except (json.JSONDecodeError, TypeError):
            log().warn("ingest cursor {} unreadable; restarting ingest", path)
            return None

    def should_skip(self, line_number: int) -> bool:
        """True while replaying the already-processed prefix."""
        return line_number <= self.line_number


def save_population(population, path: str) -> None:
    """Columnar population snapshot (pickle of the arena + incidence
    columns); restores in O(load) instead of re-parsing the VCF."""
    state = {
        "population_id": population.population_id,
        "data_source": population.data_source,
        "arena": population.arena,
        "genomes": {
            gid: {
                cid: contig.columns()
                for cid, contig in genome.contig_map.items()
            }
            for gid, genome in population.genome_map.items()
        },
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic publish


def load_population(path: str):
    from ..variant.db import ContigDB, GenomeDB, PopulationDB

    with open(path, "rb") as f:
        state = pickle.load(f)
    population = PopulationDB(
        state["population_id"], state["data_source"], state["arena"]
    )
    for gid, contigs in state["genomes"].items():
        genome = population.get_create_genome(gid)
        for cid, cols in contigs.items():
            contig = ContigDB(cid, population.arena)
            contig = contig._from_columns(cols)
            genome.contig_map[cid] = contig
    return population
