from .models import (MAX_INTRINSICS, PINHOLE, ATAN, EQUIDISTANT, RADTAN,
                     MODEL_IDS, MODEL_DIM, project, project_with_jac,
                     unproject, intrinsics_from_cfg)

__all__ = ["MAX_INTRINSICS", "PINHOLE", "ATAN", "EQUIDISTANT", "RADTAN",
           "MODEL_IDS", "MODEL_DIM", "project", "project_with_jac",
           "unproject", "intrinsics_from_cfg"]
