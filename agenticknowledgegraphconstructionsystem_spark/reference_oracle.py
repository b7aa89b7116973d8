"""Single-process pure-Python reference pipeline (SURVEY §5 item 1).

Reimplements the reference semantics end-to-end over a list of `pages`
rows using only :mod:`semantics` — no Spark.  The pytest golden tests run
the Spark pipeline on the same rows and assert:
  (a) extracted text byte-identical per url,
  (b) triple set P/R >= 0.95 (exact-match on (subj, pred, obj)),
  (c) validation findings equal.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from . import semantics as S


@dataclass
class OracleResult:
    docs: dict[str, str | None] = field(default_factory=dict)
    mentions: list[tuple] = field(default_factory=list)  # (url, name, type, rel_pct, pos, context)
    entities: dict[str, dict] = field(default_factory=dict)
    relationships: list[dict] = field(default_factory=list)
    triples: set[tuple] = field(default_factory=set)
    findings: set[tuple] = field(default_factory=set)  # (item_kind, item_key, rule, severity)


def run(rows: list[dict], gazetteer=S.GAZETTEER) -> OracleResult:
    out = OracleResult()

    # S7 extract with P1 fallback (pre-extracted text wins)
    for r in rows:
        text = r["text"] if r.get("text") is not None else S.extract_text_from_html(r.get("html"))
        out.docs[r["url"]] = text

    # D1 mentions
    per_doc: dict[str, list[S.Mention]] = {}
    for url, text in out.docs.items():
        ms = S.detect_mentions(text, gazetteer)
        if ms:
            per_doc[url] = ms
        for m in ms:
            out.mentions.append((url, m.name, m.concept_type, m.relevance_pct, m.pos, m.context))

    # A7 entities (mention_count = countDistinct(url))
    agg: dict[str, dict] = defaultdict(lambda: {"urls": set(), "rels": []})
    types: dict[str, str] = {}
    for url, name, ctype, rel, _pos, _ctx in out.mentions:
        agg[name]["urls"].add(url)
        agg[name]["rels"].append(rel)
        types[name] = ctype
    for name, a in agg.items():
        out.entities[name] = {
            "concept_type": types[name],
            "mention_count": len(a["urls"]),
            "max_rel": max(a["rels"]),
            "min_rel": min(a["rels"]),
        }

    # mention triples
    for url, name, *_ in out.mentions:
        out.triples.add((str(url), "mentions", name))

    # Agent #2 hub-and-spoke
    if per_doc:
        seminal = min(per_doc)
        sem_rel = {
            m.name: m.relevance_pct
            for m in per_doc[seminal]
            if m.relevance_pct >= S.MIN_RELEVANCE_PCT
        }
        for url, ms in per_doc.items():
            if url == seminal:
                continue
            shared = [
                m.relevance_pct + sem_rel[m.name]
                for m in ms
                if m.relevance_pct >= S.MIN_RELEVANCE_PCT and m.name in sem_rel
            ]
            hi, med, lo = S.bucket_counts(shared)
            base = S.base_confidence_pct(hi, med, lo, len(shared))
            lower_text = (out.docs[url] or "").lower()
            rtype = S.classify_relationship_type(lower_text, hi, med, lo)
            kw = S.keyword_found(lower_text)
            conf = S.final_confidence_pct(base, kw)
            expl = S.explanation_for(rtype, len(shared), hi, med, lo)
            out.relationships.append(
                {
                    "source": url,
                    "target": seminal,
                    "rel_type": rtype,
                    "confidence_pct": conf,
                    "explanation": expl,
                    "n_shared": len(shared),
                    "hi": hi,
                    "med": med,
                    "lo": lo,
                }
            )
            if rtype is not None:
                out.triples.add((str(url), rtype, str(seminal)))

    # Agent #3 findings
    link_counts = defaultdict(int)
    for name, a in agg.items():
        link_counts[name] = len(a["urls"])  # one deduped edge per (url, name)
    for name, e in out.entities.items():
        for rule, sev in S.entity_findings(
            name, e["mention_count"], link_counts[name], e["max_rel"], e["min_rel"]
        ):
            out.findings.add(("entity", name, rule, sev))
    for r in out.relationships:
        key = f"{r['source']}->{r['target']}->{r['rel_type'] or 'null'}"
        for rule, sev in S.relationship_findings(
            r["source"], r["target"], r["rel_type"], r["confidence_pct"], r["explanation"]
        ):
            out.findings.add(("relationship", key, rule, sev))
    return out
