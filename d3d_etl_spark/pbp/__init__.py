"""Play-by-play parsing pipeline — the reference's domain core re-expressed
Spark-first (SURVEY.md §3.2): text classification as a codegen'd
`when`-cascade, outs/runs as window functions, base-state tracking as a
grouped FSM, expected-runs as a group aggregate."""
