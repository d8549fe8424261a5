from tpufm.engine.oracle import search_oracle, lf_step_oracle
from tpufm.engine.xla import XLAEngine

__all__ = ["search_oracle", "lf_step_oracle", "XLAEngine"]
