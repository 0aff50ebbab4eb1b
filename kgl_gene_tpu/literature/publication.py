"""Publication model and literature analysis maps.

Capability parity with PublicationSummary and the literature analysis
containers (kgl_literature/kgl_literature.h:40, kgl_literature_analysis.h):
authors, journal/volume/issue, abstract, MeSH codes, chemical codes,
citation sets, and the derived analysis maps (by author, by year, by
journal, citation counts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

__all__ = ["PublicationSummary", "LiteratureAnalysis"]


@dataclass
class PublicationSummary:
    pmid: str
    publication_date: str = ""  # YYYY-MM-DD or YYYY-MM
    journal: str = ""
    journal_issue: str = ""
    journal_volume: str = ""
    doi: str = ""
    title: str = ""
    abstract: str = ""
    authors: List[Tuple[str, str]] = field(default_factory=list)  # (surname, initials)
    chemicals: List[Tuple[str, str]] = field(default_factory=list)  # (MeSH code, description)
    mesh_codes: List[Tuple[str, str]] = field(default_factory=list)  # (MeSH code, description)
    cited_by: Set[str] = field(default_factory=set)  # pmids citing this one

    def citation_count(self) -> int:
        return len(self.cited_by)

    def publication_year(self) -> Optional[int]:
        if self.publication_date[:4].isdigit():
            return int(self.publication_date[:4])
        return None

    def has_mesh_code(self, code: str) -> bool:
        return any(c == code for c, _ in self.mesh_codes)

    def author_string(self) -> str:
        return "; ".join(f"{surname} {initials}".strip() for surname, initials in self.authors)


class LiteratureAnalysis:
    """Derived maps over a publication collection
    (kgl_literature_analysis.h)."""

    def __init__(self, publications: Dict[str, PublicationSummary]):
        self.publications = publications

    def by_author(self) -> Dict[str, List[PublicationSummary]]:
        out: Dict[str, List[PublicationSummary]] = {}
        for pub in self.publications.values():
            for surname, initials in pub.authors:
                key = f"{surname}_{initials}".strip("_")
                out.setdefault(key, []).append(pub)
        return out

    def by_year(self) -> Dict[int, List[PublicationSummary]]:
        out: Dict[int, List[PublicationSummary]] = {}
        for pub in self.publications.values():
            year = pub.publication_year()
            if year is not None:
                out.setdefault(year, []).append(pub)
        return out

    def by_journal(self) -> Dict[str, List[PublicationSummary]]:
        out: Dict[str, List[PublicationSummary]] = {}
        for pub in self.publications.values():
            if pub.journal:
                out.setdefault(pub.journal, []).append(pub)
        return out

    def by_citation_count(self) -> List[PublicationSummary]:
        return sorted(
            self.publications.values(), key=lambda p: p.citation_count(), reverse=True
        )
