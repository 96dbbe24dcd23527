"""Operator library — every function is DataFrame -> DataFrame.

Modules map to the reference's workload families (SURVEY.md §2):
- relational: dashboard quality metrics (flink-statistics)
- auc:        AUC / UAUC ranking metrics (flink-auccalc)
- itemcf:     item-based collaborative filtering (flink-itemcf)
- windows:    analytic window functions (batch)
- setops:     union / minus / split / top-k / histograms
- dedup:      exact + near-duplicate detection (LLM-pipeline extension)
- similarity: embedding similarity search (LLM-pipeline extension)
- text:       text analysis (LLM-pipeline extension)
- multimodal: binary-column plumbing (LLM-pipeline extension)
"""
