"""Pure-Python signal core — shared by the single-node reference
labeler and the Spark pandas UDFs, so that per-document decisions and
scrubbed text are byte-identical by construction (BASELINE.md
"one implementation, two harnesses")."""
