from pelvistim_fem_tpu.models.case import Case, CaseMeta, build_case

__all__ = ["Case", "CaseMeta", "build_case"]
