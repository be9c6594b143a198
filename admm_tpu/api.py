# placeholder — full builder API arrives with the model suite
class _TODO:  # pragma: no cover
    pass
ADMMBP = ADMMLAD = ADMMDantzig = ADMMEnet = ADMMLasso = _TODO
admm_bp = admm_dantzig = admm_enet = admm_lad = admm_lasso = None
