"""Helpers to compile and run the reference C binaries as a golden oracle.

The reference sources are read-only at /root/reference; we compile selected
configurations out-of-tree into .refbin/ (gitignored). Everything here is
optional: tests that use it skip cleanly when gcc or the sources are absent.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

REF = Path("/root/reference")
REPO = Path(__file__).resolve().parent.parent
BIN = REPO / ".refbin"

_CFLAGS = ["-O3", "-m64", "-msse4.2"]


def _cc(out: Path, sources: list[str], k: int, d: int, extra: list[str] = ()):
    cmd = (
        ["gcc"]
        + _CFLAGS
        + [f"-DK_STEPS={k}", f"-DNUM_CHUNK={d}", f"-DNUM_COUNTERS={4 ** k}"]
        + ["-o", str(out)]
        + [str(REF / s) for s in sources]
        + list(extra)
    )
    subprocess.run(cmd, check=True, capture_output=True, timeout=300)


def build_reference_binaries(k: int, d: int) -> dict[str, Path] | None:
    """Compile builder/searcher/transform binaries for (k, d); returns paths
    or None if the toolchain/sources are unavailable."""
    if not REF.exists():
        return None
    BIN.mkdir(exist_ok=True)
    tag = f"{d}b{k}s"
    out = {
        "builder": BIN / f"gfmi_{tag}",
        "search": BIN / f"search_{tag}",
        "search_ac": BIN / f"search_ac_{tag}",
        "tfmi_bmp": BIN / f"tfmiBMP_{tag}",
        "tfmi_ac": BIN / f"tfmiAC_{tag}",
    }
    try:
        if not out["builder"].exists():
            _cc(
                out["builder"],
                [
                    "common/generateIndex.c",
                    "src/genFMindex.c",
                    "common/common.c",
                    "resources/div-tools/sssort.c",
                    "resources/div-tools/trsort.c",
                    "resources/divsufsort.c",
                ],
                k,
                d,
                ["-lrt", "-fopenmp"],
            )
        if not out["search"].exists():
            _cc(
                out["search"],
                [
                    "common/searchQueries.c",
                    "src/fmIndexCPUBaseline.c",
                    "common/common.c",
                ],
                k,
                d,
                ["-lrt", "-fopenmp"],
            )
        if not out["search_ac"].exists():
            _cc(
                out["search_ac"],
                [
                    "common/searchQueries.c",
                    "src/fmIndexCPUBaseline-AltCounters.c",
                    "common/common.c",
                ],
                k,
                d,
                ["-lrt", "-fopenmp"],
            )
        if not out["tfmi_bmp"].exists():
            _cc(
                out["tfmi_bmp"],
                ["common/common.c", "src/transformIndexBitmaps.c"],
                k,
                d,
            )
        if not out["tfmi_ac"].exists():
            _cc(
                out["tfmi_ac"],
                ["common/common.c", "src/transformIndexAlternateCounters.c"],
                k,
                d,
            )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return out


def run(cmd, cwd, env=None):
    import os

    full_env = dict(os.environ, **env) if env else None
    return subprocess.run(
        [str(c) for c in cmd], cwd=cwd, check=True, capture_output=True,
        timeout=3600, env=full_env,
    )
