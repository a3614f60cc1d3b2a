"""Vendored JSON-LD context documents for well-known remote context URLs.

Real web JSON-LD overwhelmingly references a handful of remote contexts
(schema.org first by a wide margin, then ActivityStreams).  Resolving
them over the network at extraction time is a non-starter at corpus
scale (and unavailable in tests), so — like the vendored IANA language
registry — the essential content ships with the package.

These are curated FUNCTIONAL SUBSETS, not byte copies: the parts the
extraction kernel consumes (`@vocab`, prefix mappings, and the
``"@type": "@id"`` coercions that decide IRI-vs-literal for string
values).  The schema.org coercion list covers the properties whose
declared range includes URL — the ones that actually change extraction
output on real pages.  JSON-LD 1.1 keyword aliasing (``"id": "@id"``)
is supported by the kernel (``kernels/extract.py:_unalias``), and the
AS2 subset declares the same ``id``/``type`` aliases the real
ActivityStreams context document does.
"""

from __future__ import annotations

SCHEMA_ORG = "https://schema.org/"
AS2 = "https://www.w3.org/ns/activitystreams#"

# schema.org properties whose range includes URL → string values are IRIs
# (mirrors the @id-typed terms of the official jsonldcontext.json)
_SCHEMA_ID_COERCED = (
    "url sameAs image logo contentUrl thumbnailUrl embedUrl "
    "mainEntityOfPage relatedLink significantLink significantLinks "
    "targetUrl downloadUrl installUrl discussionUrl serviceUrl "
    "trackingUrl paymentUrl map maps codeRepository license "
    "acquireLicensePage archivedAt usageInfo publishingPrinciples "
    "termsOfService unnamedSourcesPolicy verificationFactCheckingPolicy "
    "correctionsPolicy diversityPolicy ethicsPolicy masthead "
    "missionCoveragePrioritiesPolicy noBylinesPolicy ownershipFundingInfo "
    "actionableFeedbackPolicy diversityStaffingReport bannedIn "
    "additionalType"
).split()

SCHEMA_ORG_CONTEXT: dict = {
    "@vocab": SCHEMA_ORG,
    "schema": SCHEMA_ORG,
    **{p: {"@type": "@id"} for p in _SCHEMA_ID_COERCED},
}

# ActivityStreams 2.0 core: object/link-ranged terms are @id-coerced
_AS2_ID_COERCED = (
    "actor object target origin result instrument attributedTo "
    "attachment audience bcc bto cc to context current first last next "
    "prev following followers liked likes shares inbox outbox url href "
    "icon image inReplyTo location items oneOf anyOf partOf replies tag "
    "subject relationship describes formerType"
).split()

ACTIVITYSTREAMS_CONTEXT: dict = {
    "@vocab": AS2,
    "as": AS2,
    # the real AS2 context aliases the 1.1 keywords (w3.org/ns/activitystreams)
    "id": "@id",
    "type": "@type",
    **{p: {"@id": AS2 + p, "@type": "@id"} for p in _AS2_ID_COERCED},
}

# URL → vendored document; keys are normalized (scheme and trailing
# slash stripped, lowercased) by vendored_context()
_VENDORED: dict[str, dict] = {
    "schema.org": SCHEMA_ORG_CONTEXT,
    "schema.org/docs/jsonldcontext.json": SCHEMA_ORG_CONTEXT,
    "schema.org/docs/jsonldcontext.jsonld": SCHEMA_ORG_CONTEXT,
    "www.w3.org/ns/activitystreams": ACTIVITYSTREAMS_CONTEXT,
    "www.w3.org/ns/activitystreams.jsonld": ACTIVITYSTREAMS_CONTEXT,
}


def vendored_context(url: str) -> dict | None:
    """The vendored @context document for a remote context URL, or None."""
    key = url.strip().lower()
    for pfx in ("https://", "http://"):
        if key.startswith(pfx):
            key = key[len(pfx):]
            break
    return _VENDORED.get(key.rstrip("/#"))
