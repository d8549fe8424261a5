from tpufm.engine.oracle import search_oracle, lf_step_oracle
from tpufm.engine.xla import XLAEngine, LocateEngine

__all__ = ["search_oracle", "lf_step_oracle", "XLAEngine", "LocateEngine"]


def __getattr__(name):
    # Heavier engines import lazily (PallasEngine pulls in pallas).
    if name == "PallasEngine":
        from tpufm.engine.pallas_kernel import PallasEngine

        return PallasEngine
    if name == "make_dma_gather":
        from tpufm.engine.dma_gather import make_dma_gather

        return make_dma_gather
    raise AttributeError(name)
