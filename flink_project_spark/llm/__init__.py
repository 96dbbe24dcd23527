"""LLM-training-data pipeline operators (M5, SURVEY.md §7.2).

Beyond-reference extensions for 100 TB document/embedding corpora:
dedup (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine),
similarity search (brute-force + bucketed ANN), text analysis
(language-ID, quality, tokens, fingerprints), multimodal column
plumbing (binary payloads + typed metadata + Pandas-UDF decode).
"""
