from tpufm.engine.oracle import search_oracle, lf_step_oracle
from tpufm.engine.xla import XLAEngine, LocateEngine

__all__ = ["search_oracle", "lf_step_oracle", "XLAEngine", "LocateEngine"]
