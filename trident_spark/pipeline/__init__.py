"""KG-construction pipeline stages (SURVEY.md §2.C).

Stage order (north_star): pages scan → extract (JSON-LD/RDFa/microdata/SVO)
→ IRI resolve+normalize (inside the extraction kernel, one Arrow hop per
page) → skolemize blank nodes → entity-link against broadcast alias dict →
canonicalize via connected components → dictionary-encode → dedup → sinks.
"""

from trident_spark.pipeline.run import build_kg  # noqa: F401
