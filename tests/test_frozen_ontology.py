"""Frozen ontology similarity constants (VERDICT r4 #7).

The reference's only real unit suite pins similarity values against
hard-coded literals from a fixed corpus
(kol_ontology/unit_test/kol_test_data.h:12-50, BOOST_CHECK_CLOSE in
kol_test_LinSimilarity.cpp et al.). This file imports that strategy for
the IC/similarity stack: every expected value below is a closed-form
literal derived BY HAND from the fixture DAG — none is produced by the
code under test.

Fixture (biological_process namespace):

        R (GO:0008150, root)
       / \\
      A   B          direct annotations:  A: 1 gene   B: 2 genes
     / \\ /
    C   D            C: 1 gene   D: 1 gene
    |
    E                E: 1 gene            total = 6

Cumulative (descendant-closure) counts: E=1, C=2, D=1, A=4, B=3, R=6.
IC(t) = -ln(cum/6):   IC(A)=ln(3/2), IC(B)=ln2, IC(C)=ln3,
                      IC(D)=IC(E)=ln6, IC(R)=0;  maxIC = ln6.

Hand-derived literals (formulas from the reference,
kol_SimilarityImpl.cpp:20-140):
  MICA(C,D)=A, MICA(C,E)=C, MICA(D,B)=B, MICA(D,E)=A
  Resnik(C,D)   = ln(3/2)/ln6                       = 0.2262943855
  Lin(C,D)      = 2 ln(3/2)/(ln3+ln6)               = 0.2805626003
  Lin(C,E)      = 2 ln3/(ln3+ln6)                   = 0.7601875334
  Lin(D,B)      = 2 ln2/(ln6+ln2)                   = 0.5578858913
  Lin(D,E)      = 2 ln(3/2)/(2 ln6)                 = 0.2262943855
  JC(C,E)       = 1 - ln2/ln6                       = 0.6131471928
  JC(C,D)       = 1 - min(1, (ln3+ln6-2ln1.5)/ln6)  = 0.0
  Relevance(C,E)= Lin(C,E) * (1 - 1/3)              = 0.5067916890
  PekarStaab(C,D): depths R=0,A=1,C=D=2; LCA=A ->
                  1/((2-1)+(2-1)+1)                 = 1/3
Set fixtures: S1={C,D}, S2={B,E}; induced(S1)={A,B,C,D,R},
induced(S2)={A,B,C,E,R}; intersection {A,B,C,R}, union all six.
  SimGIC(S1,S2) = (ln1.5+ln2+ln3)/(ln1.5+ln2+ln3+2ln6) = 0.3800937667
  SimDIC(S1,S2) = 2(ln1.5+ln2+ln3)/(2(ln1.5+ln2+ln3+ln6)) = 0.5508231048
  BMA_Lin(S1,S2): row bests {Lin(C,E), Lin(D,B)},
                  col bests {Lin(D,B), Lin(C,E)}      = 0.6590367124
  Jaccard({C,D},{C,E}) = 1/3
"""

import numpy as np
import pytest

from kgl_gene_tpu.io.gaf import GafRecord
from kgl_gene_tpu.ontology.annotation import TermAnnotation
from kgl_gene_tpu.ontology.graph import GoGraph
from kgl_gene_tpu.ontology.information import InformationContent
from kgl_gene_tpu.ontology.obo import parse_go_obo
from kgl_gene_tpu.ontology.set_similarity import (
    SetSimilarityBestMatchAverage,
    SetSimilarityJaccard,
    SetSimilarityMazanduSimDIC,
    SetSimilarityPesquitaSimGIC,
)
from kgl_gene_tpu.ontology.similarity import (
    SimilarityJiangConrath,
    SimilarityLin,
    SimilarityPekarStaab,
    SimilarityRelevance,
    SimilarityResnik,
)

R, A, B, C, D, E = (
    "GO:0008150", "GO:0000002", "GO:0000003", "GO:0000004",
    "GO:0000005", "GO:0000006",
)

OBO = """format-version: 1.2

[Term]
id: GO:0008150
name: root
namespace: biological_process

[Term]
id: GO:0000002
name: A
namespace: biological_process
is_a: GO:0008150

[Term]
id: GO:0000003
name: B
namespace: biological_process
is_a: GO:0008150

[Term]
id: GO:0000004
name: C
namespace: biological_process
is_a: GO:0000002

[Term]
id: GO:0000005
name: D
namespace: biological_process
is_a: GO:0000002
is_a: GO:0000003

[Term]
id: GO:0000006
name: E
namespace: biological_process
is_a: GO:0000004
"""

# expected literals (docstring derivation)
RESNIK_CD = 0.2262943855
LIN_CD = 0.2805626003
LIN_CE = 0.7601875334
LIN_DB = 0.5578858913
LIN_DE = 0.2262943855
JC_CE = 0.6131471928
JC_CD = 0.0
REL_CE = 0.5067916890
PS_CD = 1.0 / 3.0
SIMGIC = 0.3800937667
SIMDIC = 0.5508231048
BMA_LIN = 0.6590367124


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    path = tmp_path_factory.mktemp("obo") / "mini.obo"
    path.write_text(OBO)
    graph = GoGraph(parse_go_obo(str(path)))
    records = []
    for gene, term in [
        ("g4", A), ("g5", B), ("g6", B), ("g1", C), ("g2", D), ("g3", E),
    ]:
        records.append(
            GafRecord(db="X", gene_id=gene, gene_symbol=gene, qualifier="",
                      go_term=term, evidence_code="EXP", aspect="P",
                      taxon="taxon:1")
        )
    annotation = TermAnnotation(records, graph=graph)
    info = InformationContent(graph, annotation)
    return graph, annotation, info


class TestFrozenIC:
    def test_information_content(self, stack):
        _g, _a, info = stack
        assert info.term_information(A) == pytest.approx(0.4054651081, abs=1e-9)
        assert info.term_information(B) == pytest.approx(0.6931471806, abs=1e-9)
        assert info.term_information(C) == pytest.approx(1.0986122887, abs=1e-9)
        assert info.term_information(D) == pytest.approx(1.7917594692, abs=1e-9)
        assert info.term_information(E) == pytest.approx(1.7917594692, abs=1e-9)
        assert info.term_information(R) == pytest.approx(0.0, abs=1e-12)
        assert info.max_information_content(C) == pytest.approx(
            1.7917594692, abs=1e-9
        )

    def test_shared_information_mica(self, stack):
        _g, _a, info = stack
        assert info.shared_information(C, D) == pytest.approx(
            0.4054651081, abs=1e-9
        )
        assert info.shared_information(C, E) == pytest.approx(
            1.0986122887, abs=1e-9
        )
        assert info.shared_information(D, B) == pytest.approx(
            0.6931471806, abs=1e-9
        )


class TestFrozenTermSimilarity:
    def test_resnik(self, stack):
        _g, _a, info = stack
        s = SimilarityResnik(info)
        assert s.calculate_term_similarity(C, D) == pytest.approx(
            RESNIK_CD, abs=1e-9
        )
        assert s.calculate_term_similarity(D, E) == pytest.approx(
            RESNIK_CD, abs=1e-9
        )

    def test_lin(self, stack):
        _g, _a, info = stack
        s = SimilarityLin(info)
        assert s.calculate_term_similarity(C, D) == pytest.approx(LIN_CD, abs=1e-9)
        assert s.calculate_term_similarity(C, E) == pytest.approx(LIN_CE, abs=1e-9)
        assert s.calculate_term_similarity(D, B) == pytest.approx(LIN_DB, abs=1e-9)
        assert s.calculate_term_similarity(C, C) == pytest.approx(1.0, abs=1e-12)

    def test_jiang_conrath(self, stack):
        _g, _a, info = stack
        s = SimilarityJiangConrath(info)
        assert s.calculate_term_similarity(C, E) == pytest.approx(JC_CE, abs=1e-9)
        assert s.calculate_term_similarity(C, D) == pytest.approx(JC_CD, abs=1e-12)

    def test_relevance(self, stack):
        _g, _a, info = stack
        s = SimilarityRelevance(info)
        assert s.calculate_term_similarity(C, E) == pytest.approx(REL_CE, abs=1e-9)

    def test_pekar_staab(self, stack):
        graph, _a, _info = stack
        s = SimilarityPekarStaab(graph)
        assert s.calculate_term_similarity(C, D) == pytest.approx(PS_CD, abs=1e-9)

    def test_vectorized_matrix_matches_literals(self, stack):
        """The matrix path (the TPU-tiled cache input) must agree with the
        scalar literals, not merely with the scalar code."""
        _g, _a, info = stack
        terms = [C, D, E, B]
        m = SimilarityLin(info).similarity_matrix(terms)
        assert m[0, 1] == pytest.approx(LIN_CD, abs=1e-7)
        assert m[0, 2] == pytest.approx(LIN_CE, abs=1e-7)
        assert m[1, 3] == pytest.approx(LIN_DB, abs=1e-7)
        assert m[1, 2] == pytest.approx(LIN_DE, abs=1e-7)
        r = SimilarityResnik(info).similarity_matrix(terms)
        assert r[0, 1] == pytest.approx(RESNIK_CD, abs=1e-7)


class TestFrozenSetSimilarity:
    def test_simgic(self, stack):
        graph, _a, info = stack
        s = SetSimilarityPesquitaSimGIC(graph, info)
        assert s.calculate_similarity({C, D}, {B, E}) == pytest.approx(
            SIMGIC, abs=1e-9
        )

    def test_simdic(self, stack):
        graph, _a, info = stack
        s = SetSimilarityMazanduSimDIC(graph, info)
        assert s.calculate_similarity({C, D}, {B, E}) == pytest.approx(
            SIMDIC, abs=1e-9
        )

    def test_best_match_average(self, stack):
        _g, _a, info = stack
        s = SetSimilarityBestMatchAverage(SimilarityLin(info))
        assert s.calculate_similarity({C, D}, {B, E}) == pytest.approx(
            BMA_LIN, abs=1e-9
        )

    def test_jaccard(self, stack):
        s = SetSimilarityJaccard()
        assert s.calculate_similarity({C, D}, {C, E}) == pytest.approx(
            1.0 / 3.0, abs=1e-12
        )
