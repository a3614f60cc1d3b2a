"""RDF/XML parser/serializer (pipeline/rdfxml.py).

Parser tests are pure Python (driver-testable, like the Turtle parser
tests); round-trip and chunking tests run the distributed path.
"""

import pytest
from pyspark.sql import functions as F

from trident_spark.pipeline.rdfxml import (
    RDF_NS, RdfXmlError, from_rdfxml, parse_rdfxml, to_rdfxml,
)

RDF_TYPE = RDF_NS + "type"


def _s(triples):
    return {t for t in triples}


def test_description_about_literals():
    got = parse_rdfxml("""<?xml version="1.0"?>
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:s="https://schema.org/">
        <rdf:Description rdf:about="http://x/a">
          <s:name>Alice</s:name>
          <s:label xml:lang="de">Hallo</s:label>
          <s:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer"
            >42</s:age>
        </rdf:Description>
      </rdf:RDF>""")
    assert _s(got) == {
        ("http://x/a", "https://schema.org/name", "Alice", "literal",
         None, None),
        ("http://x/a", "https://schema.org/label", "Hallo", "literal",
         None, "de"),
        ("http://x/a", "https://schema.org/age", "42", "literal",
         "http://www.w3.org/2001/XMLSchema#integer", None),
    }


def test_typed_node_and_resource():
    got = parse_rdfxml("""
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:s="https://schema.org/">
        <s:Person rdf:about="http://x/a">
          <s:knows rdf:resource="http://x/b"/>
        </s:Person>
      </rdf:RDF>""")
    assert _s(got) == {
        ("http://x/a", RDF_TYPE, "https://schema.org/Person", "iri",
         None, None),
        ("http://x/a", "https://schema.org/knows", "http://x/b", "iri",
         None, None),
    }


def test_nested_node_elements_and_nodeid():
    got = parse_rdfxml("""
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:s="https://schema.org/">
        <rdf:Description rdf:about="http://x/a">
          <s:address>
            <rdf:Description rdf:nodeID="addr">
              <s:city>Paris</s:city>
            </rdf:Description>
          </s:address>
          <s:friend rdf:nodeID="addr"/>
        </rdf:Description>
      </rdf:RDF>""")
    assert _s(got) == {
        ("http://x/a", "https://schema.org/address", "_:addr", "blank",
         None, None),
        ("_:addr", "https://schema.org/city", "Paris", "literal",
         None, None),
        ("http://x/a", "https://schema.org/friend", "_:addr", "blank",
         None, None),
    }


def test_anonymous_nested_node_is_salted_blank():
    doc = """
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:s="https://schema.org/">
        <rdf:Description rdf:about="http://x/a">
          <s:address><rdf:Description><s:city>Paris</s:city>
          </rdf:Description></s:address>
        </rdf:Description>
      </rdf:RDF>"""
    got = parse_rdfxml(doc)
    blanks = {t[0] for t in got if t[0].startswith("_:")}
    assert len(blanks) == 1
    assert parse_rdfxml(doc) == got  # deterministic per document


def test_parsetype_resource():
    got = parse_rdfxml("""
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:s="https://schema.org/">
        <rdf:Description rdf:about="http://x/a">
          <s:address rdf:parseType="Resource">
            <s:city>Paris</s:city>
          </s:address>
        </rdf:Description>
      </rdf:RDF>""")
    (addr,) = [t[2] for t in got if t[1] == "https://schema.org/address"]
    assert addr.startswith("_:")
    assert ("%s" % addr, "https://schema.org/city", "Paris", "literal",
            None, None) in _s(got)


def test_parsetype_literal_keeps_inner_xml():
    got = parse_rdfxml("""
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:s="https://schema.org/">
        <rdf:Description rdf:about="http://x/a">
          <s:desc rdf:parseType="Literal">a <b>bold</b> move</s:desc>
        </rdf:Description>
      </rdf:RDF>""")
    (t,) = got
    assert t[1] == "https://schema.org/desc"
    assert "<b>bold</b>" in t[2]
    assert t[4] == RDF_NS + "XMLLiteral"


def test_parsetype_collection():
    got = parse_rdfxml("""
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:s="https://schema.org/">
        <rdf:Description rdf:about="http://x/a">
          <s:items rdf:parseType="Collection">
            <rdf:Description rdf:about="http://x/i1"/>
            <rdf:Description rdf:about="http://x/i2"/>
          </s:items>
        </rdf:Description>
      </rdf:RDF>""")
    s = _s(got)
    (head,) = [t[2] for t in s if t[1] == "https://schema.org/items"]
    firsts = {t[0]: t[2] for t in s if t[1] == RDF_NS + "first"}
    rests = {t[0]: t[2] for t in s if t[1] == RDF_NS + "rest"}
    assert firsts[head] == "http://x/i1"
    assert firsts[rests[head]] == "http://x/i2"
    assert rests[rests[head]] == RDF_NS + "nil"


def test_rdf_li_containers():
    got = parse_rdfxml("""
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
        <rdf:Bag rdf:about="http://x/bag">
          <rdf:li>one</rdf:li>
          <rdf:li>two</rdf:li>
        </rdf:Bag>
      </rdf:RDF>""")
    s = _s(got)
    assert ("http://x/bag", RDF_NS + "_1", "one", "literal", None, None) in s
    assert ("http://x/bag", RDF_NS + "_2", "two", "literal", None, None) in s
    assert ("http://x/bag", RDF_TYPE, RDF_NS + "Bag", "iri", None, None) in s


def test_property_attributes():
    got = parse_rdfxml("""
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:s="https://schema.org/">
        <rdf:Description rdf:about="http://x/a" s:name="Alice">
          <s:address s:city="Paris" s:zip="75001"/>
        </rdf:Description>
      </rdf:RDF>""")
    s = _s(got)
    assert ("http://x/a", "https://schema.org/name", "Alice", "literal",
            None, None) in s
    (addr,) = [t[2] for t in s if t[1] == "https://schema.org/address"]
    assert addr.startswith("_:")
    assert (addr, "https://schema.org/city", "Paris", "literal",
            None, None) in s
    assert (addr, "https://schema.org/zip", "75001", "literal",
            None, None) in s


def test_xml_base_and_rdf_id():
    got = parse_rdfxml("""
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:s="https://schema.org/"
               xml:base="http://base.example/dir/doc">
        <rdf:Description rdf:about="rel/path">
          <s:see rdf:resource="../up"/>
        </rdf:Description>
        <rdf:Description rdf:ID="frag"><s:name>F</s:name></rdf:Description>
      </rdf:RDF>""")
    s = _s(got)
    assert ("http://base.example/dir/rel/path", "https://schema.org/see",
            "http://base.example/up", "iri", None, None) in s
    assert ("http://base.example/dir/doc#frag", "https://schema.org/name",
            "F", "literal", None, None) in s


def test_property_rdf_id_reifies():
    got = parse_rdfxml("""
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:s="https://schema.org/"
               xml:base="http://x/doc">
        <rdf:Description rdf:about="http://x/a">
          <s:name rdf:ID="st1">Alice</s:name>
        </rdf:Description>
      </rdf:RDF>""")
    s = _s(got)
    st = "http://x/doc#st1"
    assert ("http://x/a", "https://schema.org/name", "Alice", "literal",
            None, None) in s
    assert (st, RDF_TYPE, RDF_NS + "Statement", "iri", None, None) in s
    assert (st, RDF_NS + "subject", "http://x/a", "iri", None, None) in s
    assert (st, RDF_NS + "predicate", "https://schema.org/name", "iri",
            None, None) in s
    assert (st, RDF_NS + "object", "Alice", "literal", None, None) in s


def test_xml_lang_inheritance_and_reset():
    got = parse_rdfxml("""
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:s="https://schema.org/" xml:lang="en">
        <rdf:Description rdf:about="http://x/a">
          <s:a>inherited</s:a>
          <s:b xml:lang="">reset</s:b>
        </rdf:Description>
      </rdf:RDF>""")
    langs = {t[2]: t[5] for t in got}
    assert langs["inherited"] == "en"
    assert langs["reset"] is None


def test_strict_errors():
    with pytest.raises(RdfXmlError, match="well-formed"):
        parse_rdfxml("<rdf:RDF><unclosed>")
    with pytest.raises(RdfXmlError, match="withdrawn"):
        parse_rdfxml(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-'
            'ns#"><rdf:Description rdf:aboutEach="http://x/"/></rdf:RDF>')
    with pytest.raises(RdfXmlError, match="non-namespaced"):
        parse_rdfxml(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-'
            'ns#"><rdf:Description bare="x"/></rdf:RDF>')
    with pytest.raises(RdfXmlError, match="mutually exclusive"):
        parse_rdfxml(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-'
            'ns#" xmlns:s="https://schema.org/">'
            '<rdf:Description rdf:about="http://x/a">'
            '<s:p rdf:resource="http://x/b" rdf:nodeID="b"/>'
            "</rdf:Description></rdf:RDF>")
    with pytest.raises(RdfXmlError, match="exactly one node element"):
        parse_rdfxml(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-'
            'ns#" xmlns:s="https://schema.org/">'
            '<rdf:Description rdf:about="http://x/a"><s:p>'
            '<rdf:Description/><rdf:Description/>'
            "</s:p></rdf:Description></rdf:RDF>")


def test_stray_text_is_loud():
    """Non-whitespace character data where only elements are legal must
    raise, not parse to a smaller graph (r4 review: a dump with stripped
    property markup silently became an empty graph)."""
    rdf = 'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
    s = 'xmlns:s="https://schema.org/"'
    with pytest.raises(RdfXmlError, match="stray text"):
        parse_rdfxml(f'<rdf:RDF {rdf}><rdf:Description rdf:about="http://x"'
                     ">hello world</rdf:Description></rdf:RDF>")
    with pytest.raises(RdfXmlError, match="stray text"):
        parse_rdfxml(
            f'<rdf:RDF {rdf} {s}><rdf:Description rdf:about="http://x">'
            "<s:name>ok</s:name>orphan tail"
            "</rdf:Description></rdf:RDF>")
    with pytest.raises(RdfXmlError, match="stray text"):
        parse_rdfxml(f'<rdf:RDF {rdf}>loose</rdf:RDF>')
    # whitespace-only layout text stays legal
    got = parse_rdfxml(f"""<rdf:RDF {rdf} {s}>
        <rdf:Description rdf:about="http://x">
            <s:name>ok</s:name>
        </rdf:Description>
    </rdf:RDF>""")
    assert len(got) == 1


def test_serializer_rejects_unrepresentable():
    with pytest.raises(ValueError, match="control"):
        from trident_spark.pipeline.rdfxml import _esc_text

        _esc_text("bad \x07 bell")
    from trident_spark.pipeline.rdfxml import _split_pred

    assert _split_pred("https://schema.org/name") == \
        ("https://schema.org/", "name")
    assert _split_pred(RDF_NS + "_1") == (RDF_NS, "_1")
    with pytest.raises(ValueError, match="local part"):
        _split_pred("http://x/ends/with/slash/")


def test_roundtrip_distributed(spark):
    rows = [
        ("http://x/a", "https://schema.org/name", "Alice", "literal",
         None, None),
        ("http://x/a", "https://schema.org/label", "Grüße & <tags>",
         "literal", None, "de"),
        ("http://x/a", "https://schema.org/age", "42", "literal",
         "http://www.w3.org/2001/XMLSchema#integer", None),
        ("http://x/a", "https://schema.org/knows", "http://x/b", "iri",
         None, None),
        ("_:b1", "https://schema.org/city", "Paris", "literal", None, None),
        ("http://x/a", "https://schema.org/addr", "_:b1", "blank",
         None, None),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj_lexical string, "
              "obj_kind string, obj_datatype string, obj_lang string")
    back = from_rdfxml(to_rdfxml(df))
    assert {tuple(r) for r in back.collect()} == set(rows)


def test_hub_subject_chunks_into_multiple_docs(spark):
    """A 25k-triple subject with chunk_size=1000 must emit >1 document and
    still round-trip to the identical triple set (multiple
    rdf:Description blocks about one resource merge)."""
    df = spark.range(25000).select(
        F.lit("http://x/hub").alias("subj"),
        F.concat(F.lit("https://schema.org/p"),
                 F.col("id")).alias("pred"),
        F.concat(F.lit("v"), F.col("id")).alias("obj_lexical"),
        F.lit("literal").alias("obj_kind"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"))
    docs = to_rdfxml(df, chunk_size=1000)
    n_docs = docs.count()
    assert n_docs > 1
    back = from_rdfxml(docs)
    assert back.count() == 25000
    assert back.distinct().count() == 25000
    assert back.where(F.col("subj") != "http://x/hub").count() == 0
