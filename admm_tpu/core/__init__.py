"""Core ADMM engine (state, loop, prox)."""
from .engine import ADMMState, ProblemOps, make_admm_solver, make_fadmm_solver, make_state, warm_start
from .prox import soft_threshold, enet_prox, box_clamp_neg
