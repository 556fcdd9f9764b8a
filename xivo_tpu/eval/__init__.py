from .metrics import associate, horn_align, ate_rmse, rpe

__all__ = ["associate", "horn_align", "ate_rmse", "rpe"]
