"""Reusable DataFrame → DataFrame operators.

Modules:
    cleaning    -- scalar column helpers (F1-F10 of SURVEY.md §2.2)
    transforms  -- bronze→silver CRM entity projections (P1-P8)
    scd2        -- SCD2 merge + change detection + edge diff (T1-T8, J4, J5)
    entity_match-- staged entity matching with anti-join guard (J6)
    dedup       -- exact / MinHash-LSH / SimHash / n-gram Jaccard dedup
    similarity  -- cosine top-k ANN (brute-force + LSH-bucketed)
    multimodal  -- opaque-binary column plumbing (decode stubbed)
    sinks       -- CSV / JSON / table formatters (S15-S17)
"""
