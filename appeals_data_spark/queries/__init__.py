"""Query inventory — importing this package populates the registry.

Module -> SURVEY.md §2 family map:
  aggregates  A1-A15  group-by aggs, conditional aggs, quantiles, listagg
  filters     P1-P14  projections/filters/scalar predicates, F1-F11 scalars
  joins       J1-J18  equi/theta/wildcard/argmax/anti/self joins
  windows     W1-W10  lead/lag/row_number/running-sum/rank windows
  reshape     R1-R5   unpivot/pivot/fixed-width split
  setops      U1-U4, O1-O4  unions, set ops, sorts/top-k
  events_q    event-log model: sessionization, traces, point-in-time,
              fuzzy as-of join, windowed similarity (J10/J16/J17, X4)
  survival_q  Kaplan-Meier / survival estimators (X3)
  dedup_q     exact/minhash/simhash/ngram dedup (training-data ops)
  textops_q   language-id, quality scoring, token stats, fingerprints
  vector_q    embedding similarity search (brute-force + LSH)
  sources_q   S5-S9 CSV dim sources (sinks exercised in tests)
  streaming_q batch twins of the Structured Streaming mode (§2.10)
  multimodal_q binary payload + mapInPandas feature extraction
  skew_q      salted join/aggregation (hot-key mitigation)
"""

from . import (  # noqa: F401
    aggregates,
    filters,
    joins,
    windows,
    reshape,
    setops,
    sources_q,
    streaming_q,
    multimodal_q,
    composite_q,
    events_q,
    survival_q,
    dedup_q,
    textops_q,
    vector_q,
    skew_q,
    pipeline_q,
)
