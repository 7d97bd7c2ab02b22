"""Multi-format RDF ingest (S1 completion): Turtle and OWL/RDF-XML
fixture files load and round-trip through SparkKG — mirroring the
reference's any-format rdflib load (kg.py:153-155, exercised by
tests/test_graph.py:206-209 on an OWL file)."""

import pytest

from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.sources.rdf import (
    RDF_TYPE,
    parse_rdf_xml,
    parse_turtle,
    triples_from_rdf,
)

TTL = """\
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@base <http://base.org/> .

# a comment with ex:fake <fake> tokens
ex:alice a ex:Person ;
    ex:knows ex:bob , ex:dean ;
    ex:age "33"^^xsd:integer ;
    ex:motto "free as in # freedom"@en .
ex:bob ex:knows ex:dean .
<rel> ex:knows ex:alice .
"""

OWL_XML = """\
<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://example.org/"
         xml:base="http://base.org/x.owl">
  <ex:Person rdf:about="http://example.org/alice">
    <ex:knows rdf:resource="http://example.org/bob"/>
    <ex:age>33</ex:age>
  </ex:Person>
  <rdf:Description rdf:about="http://example.org/bob">
    <ex:knows>
      <ex:Person rdf:about="http://example.org/dean"/>
    </ex:knows>
  </rdf:Description>
  <rdf:Description rdf:ID="frag">
    <ex:label>local</ex:label>
  </rdf:Description>
</rdf:RDF>
"""

EX = "http://example.org/"


class TestTurtleParser:
    def test_full_document(self):
        got = set(parse_turtle(TTL))
        assert (f"{EX}alice", RDF_TYPE, f"{EX}Person") in got
        assert (f"{EX}alice", f"{EX}knows", f"{EX}bob") in got
        assert (f"{EX}alice", f"{EX}knows", f"{EX}dean") in got
        assert (f"{EX}alice", f"{EX}age", "33") in got
        assert (f"{EX}alice", f"{EX}motto", "free as in # freedom") in got
        assert (f"{EX}bob", f"{EX}knows", f"{EX}dean") in got
        # relative IRI resolved against @base
        assert ("http://base.org/rel", f"{EX}knows", f"{EX}alice") in got
        assert len(got) == 7

    def test_literal_ending_in_escaped_quote(self):
        # regression: .strip('"') used to eat the escaped quote and
        # leave a dangling backslash (abc\ instead of abc")
        ttl = (
            '@prefix ex: <http://e/> .\n'
            'ex:a ex:says "abc\\"" .\n'
            'ex:a ex:quip "\\"quoted\\"" .\n'
        )
        got = set(parse_turtle(ttl))
        assert ("http://e/a", "http://e/says", 'abc"') in got
        assert ("http://e/a", "http://e/quip", '"quoted"') in got

    def test_triple_quoted_literal_quote_edges(self):
        ttl = (
            '@prefix ex: <http://e/> .\n'
            'ex:a ex:doc """"starts and ends with a quote\\"""" .\n'
        )
        got = set(parse_turtle(ttl))
        assert (
            "http://e/a",
            "http://e/doc",
            '"starts and ends with a quote"',
        ) in got

    def test_undefined_prefix_raises(self):
        with pytest.raises(ValueError):
            parse_turtle("nope:x nope:y nope:z .")

    def test_subset_boundary_raises(self):
        with pytest.raises(ValueError):
            parse_turtle(
                "@prefix ex: <http://e/> . ex:a ex:b [ ex:c ex:d ] ."
            )


class TestRdfXmlParser:
    def test_full_document(self):
        got = set(parse_rdf_xml(OWL_XML))
        assert (f"{EX}alice", RDF_TYPE, f"{EX}Person") in got
        assert (f"{EX}alice", f"{EX}knows", f"{EX}bob") in got
        assert (f"{EX}alice", f"{EX}age", "33") in got
        assert (f"{EX}bob", f"{EX}knows", f"{EX}dean") in got
        assert (f"{EX}dean", RDF_TYPE, f"{EX}Person") in got
        # rdf:ID resolves against xml:base
        assert ("http://base.org/x.owl#frag", f"{EX}label", "local") in got


class TestSparkIngest:
    @pytest.fixture()
    def ttl_path(self, tmp_path):
        p = tmp_path / "g.ttl"
        p.write_text(TTL)
        return str(p)

    @pytest.fixture()
    def owl_path(self, tmp_path):
        p = tmp_path / "g.owl"
        p.write_text(OWL_XML)
        return str(p)

    def test_ttl_roundtrip_through_kg(self, spark, ttl_path):
        df = triples_from_rdf(spark, ttl_path)
        kg = SparkKG(df)
        assert kg.edge_count() == 7
        hops = {
            (r["pred"], r["obj"])
            for r in kg.get_hops(f"{EX}alice").collect()
        }
        assert (f"{EX}knows", f"{EX}bob") in hops
        assert (RDF_TYPE, f"{EX}Person") in hops

    def test_owl_roundtrip_through_kg(self, spark, owl_path):
        df = triples_from_rdf(spark, owl_path)
        kg = SparkKG(df)
        assert kg.is_exist(
            spark.createDataFrame(
                [(f"{EX}alice",), (f"{EX}dean",)], "name string"
            )
        )
        # reverse hops: who knows bob?
        rev = {r["obj"] for r in kg.get_hops(f"{EX}bob", True).collect()}
        assert rev == {f"{EX}alice"}

    def test_format_override_and_nt_route(self, spark, tmp_path):
        p = tmp_path / "data.txt"
        p.write_text(f"<{EX}a> <{EX}p> <{EX}b> .\n<{EX}a> <{EX}q> \"lit\" .\n")
        df = triples_from_rdf(spark, str(p), fmt="nt")
        got = {tuple(r) for r in df.collect()}
        assert got == {
            (f"{EX}a", f"{EX}p", f"{EX}b"),
            (f"{EX}a", f"{EX}q", "lit"),
        }

    def test_directory_of_ttl_files(self, spark, tmp_path):
        d = tmp_path / "many"
        d.mkdir()
        for i in range(3):
            (d / f"part{i}.ttl").write_text(
                f"@prefix ex: <{EX}> .\nex:s{i} ex:p ex:o{i} .\n"
            )
        df = triples_from_rdf(spark, str(d / "*.ttl"), fmt="ttl")
        assert df.count() == 3
