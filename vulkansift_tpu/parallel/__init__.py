"""Multi-device/multi-host parallelism: batched detection over device
meshes and sharded pairwise matching (NEW capability — no reference
implementation; see SURVEY.md §2.5)."""
