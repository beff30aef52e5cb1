from .code import (LDPCCode, code_from_checks, code_from_dense,
                   dense_parity_check, validate_code)
from .ensemble import (code_for_config, sample_check_table, sample_code,
                       sample_codes)
from .irregular import (IrregularEnsembleSpec, IrregularLDPCCode,
                        degree_sequences_from_lam_rho,
                        dense_parity_check_irregular,
                        irregular_code_from_dense, validate_irregular_code)

__all__ = [
    "LDPCCode",
    "code_from_checks",
    "code_from_dense",
    "dense_parity_check",
    "validate_code",
    "sample_check_table",
    "code_for_config",
    "sample_code",
    "sample_codes",
    "IrregularEnsembleSpec",
    "IrregularLDPCCode",
    "degree_sequences_from_lam_rho",
    "dense_parity_check_irregular",
    "irregular_code_from_dense",
    "validate_irregular_code",
]
