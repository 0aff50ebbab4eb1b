"""Literature subsystem tests: PubMed XML parsing, cache round trip,
publication analysis maps."""

import os

import pytest

from kgl_gene_tpu.literature.publication import LiteratureAnalysis, PublicationSummary
from kgl_gene_tpu.literature.pubmed import (
    PubmedRequester,
    parse_elink_citation_xml,
    parse_pubmed_article_xml,
)

EFETCH_XML = """<?xml version="1.0" ?>
<PubmedArticleSet>
  <PubmedArticle>
    <MedlineCitation>
      <PMID Version="1">12345</PMID>
      <Article>
        <Journal>
          <JournalIssue><Volume>42</Volume><Issue>7</Issue>
            <PubDate><Year>2021</Year><Month>Mar</Month></PubDate>
          </JournalIssue>
          <Title>Journal of Synthetic Tests</Title>
        </Journal>
        <ArticleTitle>Var gene diversity in P. falciparum.</ArticleTitle>
        <Abstract>
          <AbstractText>Background text.</AbstractText>
          <AbstractText>Results text.</AbstractText>
        </Abstract>
        <AuthorList>
          <Author><LastName>Smith</LastName><Initials>JB</Initials></Author>
          <Author><LastName>Jones</LastName><Initials>A</Initials></Author>
        </AuthorList>
      </Article>
      <MeshHeadingList>
        <MeshHeading>
          <DescriptorName UI="D008288">Malaria</DescriptorName>
        </MeshHeading>
      </MeshHeadingList>
      <ChemicalList>
        <Chemical><NameOfSubstance UI="D000638">Antigens</NameOfSubstance></Chemical>
      </ChemicalList>
    </MedlineCitation>
    <PubmedData>
      <ArticleIdList>
        <ArticleId IdType="doi">10.1000/test.doi</ArticleId>
      </ArticleIdList>
    </PubmedData>
  </PubmedArticle>
</PubmedArticleSet>
"""

ELINK_XML = """<?xml version="1.0"?>
<eLinkResult>
  <LinkSet>
    <IdList><Id>12345</Id></IdList>
    <LinkSetDb>
      <LinkName>pubmed_pubmed_citedin</LinkName>
      <Link><Id>111</Id></Link>
      <Link><Id>222</Id></Link>
    </LinkSetDb>
  </LinkSet>
</eLinkResult>
"""


class TestXmlParsing:
    def test_efetch_parse(self):
        pubs = parse_pubmed_article_xml(EFETCH_XML)
        assert "12345" in pubs
        pub = pubs["12345"]
        assert pub.title.startswith("Var gene diversity")
        assert pub.journal == "Journal of Synthetic Tests"
        assert pub.journal_volume == "42" and pub.journal_issue == "7"
        assert pub.publication_date == "2021-Mar"
        assert pub.publication_year() == 2021
        assert pub.authors == [("Smith", "JB"), ("Jones", "A")]
        assert pub.mesh_codes == [("D008288", "Malaria")]
        assert pub.chemicals == [("D000638", "Antigens")]
        assert pub.doi == "10.1000/test.doi"
        assert "Background text." in pub.abstract

    def test_elink_parse(self):
        citations = parse_elink_citation_xml(ELINK_XML)
        assert citations == {"12345": {"111", "222"}}

    def test_bad_xml(self):
        assert parse_pubmed_article_xml("<not-closed") == {}
        assert parse_elink_citation_xml("garbage") == {}


class TestRequesterCache:
    def test_cache_round_trip(self, tmp_path):
        cache_dir = str(tmp_path / "pubmed")
        os.makedirs(cache_dir)
        # Simulate a prior run's cache files.
        requester = PubmedRequester("pm", cache_directory=cache_dir)
        requester._append_cache("pubmed_publication_cache.xml", EFETCH_XML)
        requester._append_cache("pubmed_citation_cache.xml", ELINK_XML)
        # Fresh requester loads from disk; no network needed.
        reloaded = PubmedRequester("pm", cache_directory=cache_dir,
                                   allow_network=False)
        pubs = reloaded.get_publications(["12345", "99999"])
        assert set(pubs) == {"12345"}
        assert pubs["12345"].citation_count() == 2  # citations attached
        cites = reloaded.get_citations(["12345"])
        assert cites["12345"] == {"111", "222"}


class TestAnalysisMaps:
    def test_maps(self):
        pubs = parse_pubmed_article_xml(EFETCH_XML)
        pubs["12345"].cited_by = {"111", "222"}
        second = PublicationSummary(pmid="67890", publication_date="2019",
                                    journal="Journal of Synthetic Tests",
                                    authors=[("Smith", "JB")])
        pubs["67890"] = second
        analysis = LiteratureAnalysis(pubs)
        assert set(analysis.by_year()) == {2021, 2019}
        assert len(analysis.by_author()["Smith_JB"]) == 2
        assert len(analysis.by_journal()["Journal of Synthetic Tests"]) == 2
        ranked = analysis.by_citation_count()
        assert ranked[0].pmid == "12345"

    @staticmethod
    def _citation_collection():
        """Base paper (2015-01) cited by three dated papers."""
        pubs = {
            "base": PublicationSummary(
                pmid="base", publication_date="2015-01-10",
                journal="J1", authors=[("Ada", "L")],
                cited_by={"c1", "c2", "c3", "missing"},
            ),
            "c1": PublicationSummary(pmid="c1", publication_date="2015-04"),
            "c2": PublicationSummary(pmid="c2", publication_date="2016-01"),
            "c3": PublicationSummary(pmid="c3", publication_date="2016-01"),
            "late": PublicationSummary(pmid="late", publication_date="2026-01"),
        }
        return pubs

    def test_citation_period(self):
        analysis = LiteratureAnalysis(self._citation_collection())
        # c1: +3 months; c2/c3: +12 months; 'missing' unresolvable.
        assert analysis.citation_period() == {3: 1, 12: 2}
        assert analysis.publication_citations("base") == [(3, 1), (12, 2)]
        assert analysis.publication_citations("nope") == []

    def test_citation_variance_cumulative(self):
        analysis = LiteratureAnalysis(self._citation_collection())
        var = analysis.citation_variance(max_period_months=24)
        # One contributing publication -> variance 0; cumulative % steps
        # 0 -> 33.3 at month 3 -> 100 at month 12.
        assert var[0] == (0.0, 0.0)
        assert abs(var[3][0] - 100.0 / 3) < 1e-9
        assert var[12] == (100.0, 0.0)
        assert var[23] == (100.0, 0.0)

    def test_quartiles_and_histogram(self):
        analysis = LiteratureAnalysis(self._citation_collection())
        # Aged >= 120 months relative to the newest date (2026-01): the
        # base paper (132 months) and the 2015/2016 citers qualify.
        quartiles = analysis.citation_quartiles(months_elapsed=120)
        assert len(quartiles) == 4
        top = quartiles.percentile(1.0)
        assert top[0] == 4 and top[1].pmid == "base"
        hist = dict(analysis.citation_distribution(months_elapsed=120))
        assert hist[0] == 3  # c1, c2, c3 uncited
        assert hist[4] == 1  # base with 4 citations
        assert analysis.most_recent_publication().pmid == "late"
