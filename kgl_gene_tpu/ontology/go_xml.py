"""GO OBO-XML parser.

Capability parity with ParserGoXml/ParserGoRapidXml
(kol_ontology/kol_ParserGoXml.h, kol_ParserGoRapidXml.h): parses the
go_daily-termdb.obo-xml format (<obo><term>...</term></obo>) into the same
GoTermRecord stream the OBO parser produces, via lxml instead of rapidxml.
"""

from __future__ import annotations

from typing import List

from lxml import etree

from ..utils.logging import log
from .obo import GoTermRecord

__all__ = ["parse_go_xml"]


def parse_go_xml(path: str) -> List[GoTermRecord]:
    records: List[GoTermRecord] = []
    try:
        tree = etree.parse(path)
    except (OSError, etree.XMLSyntaxError) as exc:
        log().error("GO XML parse failed: {}", exc)
        return records
    for term in tree.iter("term"):
        record = GoTermRecord()
        record.term_id = term.findtext("id", "").strip()
        record.name = term.findtext("name", "").strip()
        record.namespace = term.findtext("namespace", "").strip()
        defn = term.find("def")
        if defn is not None:
            record.definition = (defn.findtext("defstr", "") or "").strip()
        for alt in term.findall("alt_id"):
            if alt.text:
                record.alt_ids.append(alt.text.strip())
        for isa in term.findall("is_a"):
            if isa.text:
                record.relations.append(("is_a", isa.text.strip()))
        for rel in term.findall("relationship"):
            rel_type = rel.findtext("type", "").strip()
            target = rel.findtext("to", "").strip()
            if rel_type and target:
                record.relations.append((rel_type, target))
        obsolete = term.findtext("is_obsolete", "")
        record.obsolete = obsolete.strip() in ("1", "true")
        if record.term_id:
            records.append(record)
    return records
