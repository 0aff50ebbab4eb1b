"""Shared-information (CDA) calculator tests on the mini ontology."""

import math

import pytest

from kgl_gene_tpu.ontology.annotation import TermAnnotation
from kgl_gene_tpu.ontology.graph import GoGraph
from kgl_gene_tpu.ontology.information import InformationContent
from kgl_gene_tpu.ontology.obo import parse_go_obo
from kgl_gene_tpu.ontology.shared_information import (
    InformationAncestorMean,
    InformationCoutoGraSM,
    InformationCoutoGraSMAdjusted,
    InformationExclusiveInherited,
    InformationFrontier,
)
from kgl_gene_tpu.ontology.similarity import SimilarityLin

from test_ontology import OBO_TEXT, _gaf


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("obo") / "mini.obo"
    path.write_text(OBO_TEXT)
    graph = GoGraph(parse_go_obo(str(path)))
    annotation = TermAnnotation(
        [_gaf("geneA", "GO:0000004"), _gaf("geneB", "GO:0000005"),
         _gaf("geneC", "GO:0000006"), _gaf("geneD", "GO:0000002"),
         _gaf("geneE", "GO:0000003")],
        graph=graph,
    )
    info = InformationContent(graph, annotation)
    return graph, info


class TestAncestorMean:
    def test_mean_over_common(self, setup):
        graph, info = setup
        calc = InformationAncestorMean(graph, info)
        # t4, t5 share {t2, root}: mean(IC(t2), 0).
        want = (math.log(1.25) + 0.0) / 2
        assert abs(calc.shared_information("GO:0000004", "GO:0000005") - want) < 1e-12

    def test_plugs_into_lin(self, setup):
        graph, info = setup
        lin = SimilarityLin(InformationAncestorMean(graph, info))
        value = lin.calculate_term_similarity("GO:0000004", "GO:0000005")
        want = 2 * ((math.log(1.25)) / 2) / (2 * math.log(5))
        assert abs(value - want) < 1e-12


class TestGraSM:
    def test_identity(self, setup):
        graph, info = setup
        calc = InformationCoutoGraSM(graph, info)
        assert calc.common_disjoint_ancestors("GO:0000004", "GO:0000004") == {"GO:0000004"}

    def test_cda_subset_of_common(self, setup):
        graph, info = setup
        for cls in (InformationCoutoGraSM, InformationCoutoGraSMAdjusted):
            calc = cls(graph, info)
            cda = calc.common_disjoint_ancestors("GO:0000004", "GO:0000006")
            common = graph.get_self_ancestor_terms("GO:0000004") & \
                graph.get_self_ancestor_terms("GO:0000006")
            assert cda <= common
            assert cda  # non-empty
            # shared info bounded by MICA IC from above? (mean <= max)
            assert calc.shared_information("GO:0000004", "GO:0000006") <= \
                info.shared_information("GO:0000004", "GO:0000006") + 1e-12

    def test_path_count(self, setup):
        graph, info = setup
        calc = InformationCoutoGraSM(graph, info)
        root = graph.term_index("GO:0008150")
        t6 = graph.term_index("GO:0000006")
        # t6 -> root via is_a(t3) and part_of(t2): 2 paths.
        assert calc._path_count(root, t6) == 2


class TestFrontierAndExclusive:
    def test_frontier_is_maximal(self, setup):
        graph, info = setup
        calc = InformationFrontier(graph, info)
        cda = calc.common_disjoint_ancestors("GO:0000004", "GO:0000006")
        # common = {t2, root}; t2 has no common-ancestor descendant... root
        # has descendant t2 in the common set -> only t2 is maximal.
        assert cda == {"GO:0000002"}
        assert abs(calc.shared_information("GO:0000004", "GO:0000006") - math.log(1.25)) < 1e-12

    def test_exclusive_inherited(self, setup):
        graph, info = setup
        calc = InformationExclusiveInherited(graph, info)
        cda = calc.common_disjoint_ancestors("GO:0000004", "GO:0000006")
        # t2's children include t4 (exclusive to A-side) and t6 (exclusive);
        # root's children include t3 (exclusive via t6 ancestry).
        assert "GO:0000002" in cda
        assert calc.shared_information("GO:0000004", "GO:0000006") > 0.0
