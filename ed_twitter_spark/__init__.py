"""ed_twitter_spark — a PySpark-native knowledge-graph construction engine.

From-scratch reimplementation of the query/data-processing capabilities of
the reference `bitcit/ed_twitter` (embedding-based entity disambiguation over
tweets), re-expressed as an idiomatic Spark pipeline over conversation
transcripts:

    transcripts -> mention detection -> candidate generation (broadcast KB)
    -> embedding prerank + local attention scoring (Arrow-batched numpy)
    -> per-conversation joint inference (loopy BP, grouped-map UDF)
    -> triple emission -> canonicalization (connected components)
    -> vertex/edge materialization with per-stage checkpoints.

See SURVEY.md for the operator-by-operator mapping (file:line cites into
/root/reference).
"""

__version__ = "0.1.0"
