"""Named, composable operators over the DataFrame API.

Each module covers one band of SURVEY.md §2's operator inventory:

- cleaning     — §2.2/§2.4 dirty-ingest semantics (null normalize/profile,
                 embedded-header filter, declarative casts, timestamp
                 quarantine, median imputation, exact dedup)
- relational   — §2.3–2.5 joins/aggs/sorts/samples/sets as named ops
- features     — §2.6/§2.7 feature engineering (cyclical, distance,
                 time split, group-count features)
- ml           — §2.7 distributed ML pipeline (indexers, weights, trainer)
- text         — north-star text analysis over documents
- dedup        — exact + near-duplicate detection (MinHash/SimHash/Jaccard)
- similarity   — ANN search over embedding arrays
- multimodal   — binary-column plumbing with stubbed decoders
"""
