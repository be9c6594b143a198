from .trace import Trace, format_trace, traced_solve
