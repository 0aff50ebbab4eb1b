"""Application shell end-to-end tests: XML runtime config -> package
execution -> analysis outputs (the kgl_genome main-path equivalent)."""

import os

import numpy as np
import pytest

import kgl_gene_tpu.analysis  # noqa: F401 — registers plugins
from kgl_gene_tpu.app.analysis import PackageAnalysis, analysis_factory
from kgl_gene_tpu.app.exec_env import GeneExecEnv, run_application
from kgl_gene_tpu.app.package import ExecutePackage
from kgl_gene_tpu.app.runtime import RuntimeProperties

from fixtures import CONTIG_1, VCF_SAMPLES, make_genome_files, write_vcf


def _write_runtime_xml(path, files, vcf_path, work_dir):
    xml = f"""<?xml version="1.0"?>
<runTime>
  <workDirectory>{work_dir}</workDirectory>
  <executeList>
    <active>testPackage</active>
  </executeList>
  <packageList>
    <package>
      <packageIdent>testPackage</packageIdent>
      <resourceList>
        <resourceIdent>testGenome</resourceIdent>
      </resourceList>
      <iterationList>
        <iteration>
          <fileIdent>popVCF</fileIdent>
        </iteration>
      </iterationList>
      <analysisList>
        <analysisIdent>NULL</analysisIdent>
        <analysisIdent>INTERVAL</analysisIdent>
        <analysisIdent>INFO_FILTER</analysisIdent>
        <analysisIdent>INBREED</analysisIdent>
        <analysisIdent>PfSEQUENCE</analysisIdent>
      </analysisList>
    </package>
  </packageList>
  <analysisList>
    <analysis>
      <analysisIdent>INTERVAL</analysisIdent>
      <parameterIdent>intervalParams</parameterIdent>
    </analysis>
    <analysis>
      <analysisIdent>PfSEQUENCE</analysisIdent>
      <parameterIdent>seqParams</parameterIdent>
    </analysis>
  </analysisList>
  <parameterList>
    <parameterBlock>
      <blockName>intervalParams</blockName>
      <parameter><name>IntervalSize</name><value>100</value></parameter>
    </parameterBlock>
    <parameterBlock>
      <blockName>seqParams</blockName>
      <parameter><name>GeneList</name><value>GENE1</value></parameter>
    </parameterBlock>
  </parameterList>
  <dataFileList>
    <dataFile>
      <fileIdent>popVCF</fileIdent>
      <fileName>{vcf_path}</fileName>
      <parser>PF_DIPLOID</parser>
      <evidenceIdent>vcfEvidence</evidenceIdent>
    </dataFile>
  </dataFileList>
  <resourceList>
    <resource>
      <resourceType>GenomeDatabase</resourceType>
      <resourceIdent>testGenome</resourceIdent>
      <fastaFile>{files['fasta']}</fastaFile>
      <gffFile>{files['gff']}</gffFile>
      <gafFile>{files['gaf']}</gafFile>
    </resource>
  </resourceList>
  <aliasList>
    <alias>
      <contigIdent>{CONTIG_1}</contigIdent>
      <contigType>AUTOSOME</contigType>
      <aliasIdent>chr1_alias</aliasIdent>
    </alias>
  </aliasList>
  <evidenceList>
    <evidence>
      <evidenceIdent>vcfEvidence</evidenceIdent>
      <vcfInfoList>
        <infoIdent>AF</infoIdent>
        <infoIdent>DP</infoIdent>
        <infoIdent>VALIDATED</infoIdent>
      </vcfInfoList>
    </evidence>
  </evidenceList>
</runTime>
"""
    with open(path, "w") as f:
        f.write(xml)
    return path


@pytest.fixture(scope="module")
def app_setup(tmp_path_factory):
    base = tmp_path_factory.mktemp("app")
    files = make_genome_files(base)
    vcf_path = write_vcf(str(base / "pop.vcf"))
    work_dir = str(base / "work")
    xml_path = _write_runtime_xml(str(base / "runtime.xml"), files, vcf_path, work_dir)
    return xml_path, work_dir


class TestRuntimeProperties:
    def test_parse_xml(self, app_setup):
        xml_path, work_dir = app_setup
        props = RuntimeProperties.read_properties(xml_path)
        assert props.active_packages == ["testPackage"]
        pkg = props.get_package("testPackage")
        assert pkg.resource_idents == ["testGenome"]
        assert pkg.iteration_lists == [["popVCF"]]
        assert "INBREED" in pkg.analysis_idents
        assert props.data_files["popVCF"].parser_type == "PF_DIPLOID"
        assert props.data_files["popVCF"].evidence_ident == "vcfEvidence"
        assert props.evidence_fields("vcfEvidence") == ["AF", "DP", "VALIDATED"]
        assert props.contig_alias.lookup("chr1_alias") == CONTIG_1
        params = props.analysis_parameters("INTERVAL")
        assert params[0].value("IntervalSize") == "100"
        assert props.resources["testGenome"].resource_type == "GenomeDatabase"


class TestExecutePackage:
    def test_end_to_end(self, app_setup):
        xml_path, work_dir = app_setup
        props = RuntimeProperties.read_properties(xml_path)
        executor = ExecutePackage(props)
        executor.execute_active()
        outputs = os.listdir(work_dir)
        assert "interval_density.csv" in outputs
        assert "info_field_stats.csv" in outputs
        assert "inbreeding.csv" in outputs
        assert any(f.startswith("sequence_GENE1") and f.endswith(".csv") for f in outputs)
        assert any(f.endswith(".nwk") for f in outputs)

        # Interval density CSV sanity: 4 bins of 100 for contig1 (400bp).
        with open(os.path.join(work_dir, "interval_density.csv")) as f:
            lines = f.read().strip().split("\n")
        assert lines[0] == ("Contig,Start,VariantCount,SNPCount,"
                            "TransitionCount,TransversionCount,TiTv")
        contig1_rows = [l for l in lines[1:] if l.startswith(CONTIG_1)]
        assert len(contig1_rows) == 4
        total_variants = sum(int(r.split(",")[2]) for r in contig1_rows)
        assert total_variants == 5  # unique alleles on contig 1
        # Ti/Tv densities (kga_analysis_interval.h:87-121): every SNP is a
        # transition or a transversion, and the fixture counts match the
        # spec-derived oracle.
        from kgl_gene_tpu.sequence.alphabet import DNA5
        from fixtures import vcf_variant_specs

        expected_ti = expected_tv = 0
        for spec in vcf_variant_specs():
            if spec["contig"] != CONTIG_1:
                continue
            for alt in spec["alts"]:
                if len(spec["ref"]) == 1 and len(alt) == 1:
                    ref_c = DNA5.from_string(spec["ref"])[0]
                    alt_c = DNA5.from_string(alt)[0]
                    if bool(DNA5.is_transition(np.array([alt_c]), np.array([ref_c]))[0]):
                        expected_ti += 1
                    else:
                        expected_tv += 1
        total_ti = sum(int(r.split(",")[4]) for r in contig1_rows)
        total_tv = sum(int(r.split(",")[5]) for r in contig1_rows)
        assert (total_ti, total_tv) == (expected_ti, expected_tv)
        for r in contig1_rows:
            parts = r.split(",")
            assert int(parts[3]) == int(parts[4]) + int(parts[5])

        # Inbreeding CSV has one row per sample genome.
        with open(os.path.join(work_dir, "inbreeding.csv")) as f:
            inbreed_lines = f.read().strip().split("\n")
        assert len(inbreed_lines) == 1 + len(VCF_SAMPLES)

        # Sequence report covers all genomes.
        seq_csv = [f for f in outputs if f.startswith("sequence_GENE1") and f.endswith(".csv")][0]
        with open(os.path.join(work_dir, seq_csv)) as f:
            seq_lines = f.read().strip().split("\n")
        assert len(seq_lines) == 1 + len(VCF_SAMPLES)
        # S1 carries 2 coding variants for GENE1.
        s1_row = [l for l in seq_lines if l.startswith("S1,")][0]
        assert ",2," in s1_row

    def test_cli_run_application(self, app_setup):
        xml_path, work_dir = app_setup
        code = run_application(GeneExecEnv, ["--optionFile", xml_path,
                                            "--workDirectory", work_dir])
        assert code == 0


class TestAnalysisFramework:
    def test_factory(self):
        assert analysis_factory("NULL") is not None
        assert analysis_factory("NO_SUCH") is None

    def test_failed_analysis_dropped(self, app_setup):
        from kgl_gene_tpu.app.analysis import VirtualAnalysis, register_analysis

        @register_analysis
        class FailingAnalysis(VirtualAnalysis):
            ANALYSIS_IDENT = "FAIL_TEST"

            def file_read_analysis(self, data_object):
                raise RuntimeError("boom")

        pa = PackageAnalysis(".", None)
        pa.initialize(["FAIL_TEST", "NULL"], None)
        assert len(pa.active) == 2
        pa.file_read_analysis(object())
        assert len(pa.active) == 1  # FAIL_TEST dropped
        assert pa.active[0].ANALYSIS_IDENT == "NULL"


class TestDataSourceTable:
    def test_characteristics_lookup(self):
        from kgl_gene_tpu.io.data_source import (
            DataSource,
            DataStructure,
            ParserType,
            find_characteristic,
        )

        c = find_characteristic("Falciparum")
        assert c.parser_type is ParserType.DiploidFalciparum
        assert c.data_structure is DataStructure.DiploidUnphased
        assert find_characteristic(DataSource.Genome1000).parser_type is ParserType.DiploidPhased
        assert find_characteristic("JSONdbSNP").data_structure is DataStructure.CitationMap
        assert find_characteristic("nope") is None

    def test_named_source_dispatch(self, app_setup):
        """A dataFile declared with source text 'Falciparum' parses through
        the characteristics table."""
        from kgl_gene_tpu.app.package import ParserSelection
        from kgl_gene_tpu.app.resources import AnalysisResources
        from kgl_gene_tpu.app.runtime import RuntimeProperties, RuntimeVCFFileInfo

        xml_path, work_dir = app_setup
        props = RuntimeProperties.read_properties(xml_path)
        info = props.data_files["popVCF"]
        named = RuntimeVCFFileInfo(info.file_ident, info.file_name,
                                   "Falciparum", info.evidence_ident)
        population = ParserSelection.parse_data(named, props, AnalysisResources())
        assert population is not None
        assert population.genome_count() == 4
