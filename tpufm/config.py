"""Index configuration.

The reference makes (k, d, layout) compile-time choices stamped into binary
names (reference makefile:140-207, -DK_STEPS/-DNUM_CHUNK/-DNUM_COUNTERS).
Here they are one dataclass resolved at trace time: a jit specialization per
config replaces the reference's compile sweep.
"""

from __future__ import annotations

import dataclasses
import enum


class Layout(enum.Enum):
    """On-device packing of the Occ/bitmap entry table.

    Mirrors the reference's four on-disk index kinds (SURVEY.md section 2):
      BASELINE     — tag 100: per-entry [bitmaps by (step, plane, window)][4^k counters]
                     (reference src/genFMindex.c:42-45)
      INTERLEAVED  — tag 101: bitmaps regrouped by (window, step, plane) so one
                     aligned 16B vector holds all 2k planes of a 32-base window
                     (reference src/transformIndexBitmaps.c:269-295)
      ALT_COUNTERS — tag 200: half the 4^k counters per entry, alternating
                     halves between even/odd entries; queries for the "other
                     half" read the next entry and count backwards
                     (reference src/transformIndexAlternateCounters.c:434-479)
      INTERLEAVED_ALT_COUNTERS — tag 201: both transforms combined
                     (reference src/transformIndexAlternateCounters.c:387-432)
    """

    BASELINE = "baseline"
    INTERLEAVED = "interleaved"
    ALT_COUNTERS = "alt_counters"
    INTERLEAVED_ALT_COUNTERS = "interleaved_alt_counters"

    @property
    def fmi_tag(self) -> int:
        return {
            Layout.BASELINE: 100,
            Layout.INTERLEAVED: 101,
            Layout.ALT_COUNTERS: 200,
            Layout.INTERLEAVED_ALT_COUNTERS: 201,
        }[self]

    @property
    def has_slim_counters(self) -> bool:
        return self in (Layout.ALT_COUNTERS, Layout.INTERLEAVED_ALT_COUNTERS)

    @staticmethod
    def from_fmi_tag(tag: int) -> "Layout":
        for layout in Layout:
            if layout.fmi_tag == tag:
                return layout
        raise ValueError(f"unknown .fmi index tag {tag}")


@dataclasses.dataclass(frozen=True)
class IndexConfig:
    """Static configuration of a k-step FM-index.

    k:      number of LF steps fused per memory round (reference K_STEPS).
            One lookup advances backward search by k bases.
    d:      block sampling rate in bases (reference NUM_CHUNK); each entry
            covers d BWT positions with d/32 32-bit words per bit-plane.
    layout: entry-table packing (see Layout).
    """

    k: int = 2
    d: int = 64
    layout: Layout = Layout.BASELINE

    def __post_init__(self):
        if self.k < 1 or self.k > 8:
            raise ValueError(f"k must be in [1, 8], got {self.k}")
        if self.d % 32 != 0 or self.d <= 0:
            raise ValueError(f"d must be a positive multiple of 32, got {self.d}")

    @property
    def num_counters(self) -> int:
        """Counters per logical entry: 4^k (reference NUM_COUNTERS)."""
        return 4 ** self.k

    @property
    def num_slim_counters(self) -> int:
        """Counters stored per entry under alternate-counters: 4^k / 2."""
        return self.num_counters // 2

    @property
    def words_per_plane(self) -> int:
        """32-bit words per bit-plane per entry (reference NUM_BITMAPS = d/32)."""
        return self.d // 32

    @property
    def bitmap_words(self) -> int:
        """Total bitmap words per entry: 2 planes x k steps x d/32 windows."""
        return 2 * self.k * self.words_per_plane

    def num_entries(self, bwtsize: int) -> int:
        """ceil(bwtsize / d) (reference src/genFMindex.c:477)."""
        return -(-bwtsize // self.d)

    def entry_bytes(self) -> int:
        """Bytes per entry in the given layout."""
        counters = (
            self.num_slim_counters if self.layout.has_slim_counters else self.num_counters
        )
        return 4 * (self.bitmap_words + counters)


#: Measured MSA/VMEM fast-path boundary (round 3, docs/PERF.md "The
#: valley, diagnosed"): XLA's memory-space assignment keeps the whole
#: entries table resident in VMEM — where gathers run ~87M rows/s instead
#: of ~51-61M from HBM — when the table's PHYSICAL tiled footprint fits
#: its budget. With T(8,128) tiling every row <= 128 words occupies 512 B,
#: so the rule is entries <= ~210K AND row words <= 128.
VMEM_FAST_ENTRIES = 210_000

#: Largest reference (bases) whose d=192 HBM program fits one v5e chip
#: (probe85/86): the gather emitter's windowed table pre-copy doubles
#: the 1.28x lane-padded entries (100 -> 128 words), so
#: 2 x (bases/192) x 512 B + ~2.5 GB of loop temps must stay under
#: 15.75 GB of HBM; past this, d=320's one-tile rows halve the
#: per-base cost and a 3.2 Gbase genome runs single-chip.
HBM_MAX_D192_BASES = 2_400_000_000

#: largest reference the 8.6 GB 15-mer LUT co-resides with: LUT + the
#: gather emitter's 2x working copy of the entries table + ~2.4 GB of
#: loop temps against 15.75 GB of v5e HBM (docs/PERF.md "The LUT
#: ladder's last rung"; probe 93a capacity bound)
LUT15_MAX_BASES = 1_000_000_000


def recommend_config(refsize: int, query_len: int = 120,
                     serving: bool = False) -> dict:
    """Measured-best single-chip configuration for a reference of `refsize`
    bases (TPU v5e numbers, docs/PERF.md).

    k=3 dominates k in {1,2} (more rounds at the same gather rate) and
    k in {4,5} (fewer rounds at a third of the rate — the row-width cliff,
    PERF.md "High-k refutation"). d: the round-4 bracketed ladder
    (probe79) measured d=192 fastest whenever it fits the VMEM fast path
    (10 Mbase: 2.24M reads/s vs d=128's 2.11M, d=256's 1.99M, d=320's
    2.06M), and d=320 next (63M: 2.04M, 69M: 1.96M) — so the preference
    is 192 (refs <= ~40 Mbase), then 320 (<= ~67 Mbase); d=128/256 are
    never optimal. d > 320 would exceed 128 row words, doubling the
    physical footprint (tile padding) and losing VMEM residency. Beyond
    ~69 Mbase no d fits and throughput is ~940-970K reads/s flat to at
    least 8M rows / 3.2 GB of entries (tree-pick HBM regime,
    probes 74/75/85); d=192 is kept there (the sharded-mode layout
    convention) — up to ~2.4 Gbase. Past that, d=192 cannot FIT one
    chip: XLA's gather emitter materializes a windowed pre-copy of the
    whole entries table (probe85/86: copy.28, 1.3x lane-padded, so
    2 x 1.28 x table bytes + ~2.4 GB of loop temps against 15.75 GB of
    HBM — OOM at 16.7M rows). d=320's 124-word rows fill one lane tile
    (1.03x padding), halving the per-base footprint: a full 3.2 Gbase
    genome runs single-chip at 886K reads/s (probe86, bracketed), so
    the last rung is d=320 (fits to ~4 Gbase; beyond that, shard over a
    mesh — parallel/search.py). A 12-mer prefix LUT removes lut_m/k
    rounds whenever the query length permits.

    lut_m=15 (the next rung: m % k == 0 at k=3) measures +2.4% over
    m=12 at protocol scale (probe87c, 2.31M vs 2.26M reads/s, bracketed)
    but costs an 8.6 GB HBM-resident table and a minutes-long device
    build, so it is NOT recommended by default — opt in explicitly
    (XLAEngine(lut_m=15) / --lut 15) for sustained serving on small
    references where the HBM headroom exists (entries + 8.6 GB + ~2.4 GB
    loop temps must fit 15.75 GB: refs up to ~1 Gbase at d=192).

    serving=True: accept the lut15 trade (8.6 GB HBM + a minutes-long
    one-time device build for +2.4-2.7% sustained throughput — measured
    in BOTH regimes, probes 87c/93a/94) whenever it fits and divides the
    query length; otherwise the default ladder is returned unchanged.

    Returns {'k', 'd', 'lut_m'} kwargs for IndexConfig / XLAEngine.
    """
    # k must divide the query length (the per-round fused k-mer contract,
    # reference src/fmIndexCPUBaseline.c:200); k=3 is measured-best.
    k = next((kk for kk in (3, 2, 1) if query_len % kk == 0), 1)
    bwtsize = refsize + 1
    d = next(
        (dd for dd in (192, 320)
         if -(-bwtsize // dd) <= VMEM_FAST_ENTRIES),
        192 if bwtsize <= HBM_MAX_D192_BASES else 320,
    )
    lut_m = 0
    if query_len >= 24:
        # largest m <= 12 with m % k == 0 (then (query_len - m) % k == 0 too)
        lut_m = 12 - (12 % k)
    if (
        serving
        and query_len >= 30
        and 15 % k == 0
        # co-residency: 8.6 GB LUT + the gather emitter's 2x working copy
        # of the entries table must fit 15.75 GB HBM (docs/PERF.md "The
        # LUT ladder's last rung" + probe 93a's capacity bound)
        and refsize <= LUT15_MAX_BASES
    ):
        lut_m = 15
    return {"k": k, "d": d, "lut_m": lut_m}
