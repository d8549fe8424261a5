"""Probe 86: genome scale at d=320 (follow-up to probe85's d=192 OOM).

probe85 pinned the d=192 genome-scale OOM: the gather emitter's windowed
whole-table pre-copy (copy.28) doubles the 1.28x lane-padded entries
(100 -> 128 words/row), 16.6 GB > 15.75 GB at 16.7M rows. d=320's
124-word rows fill one lane tile (1.03x padding) at half the per-base
cost. Bracketed points: 8M and 10M rows (a 3.2 Gbase genome) at
k=3 d=320 fused lut12, 1M-read waves. Result (probe86_session.jsonl):
873K / 886K reads/s, ctl 2.09-2.11M both sides. recommend_config's last
rung is d=320 accordingly (config.HBM_MAX_D192_BASES)."""

# Run inline 2026-08-19 (see probe86_session.jsonl); the body matched
# probe85.py with d=320 and points (8M, 10M), plus the compiled-HLO
# copy.28 / input_formats checks recorded in docs/PERF.md
# "Genome scale on one chip".
