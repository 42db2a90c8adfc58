from .loader import (loadbasis, list_basis_sets,  # noqa: F401
                     register_basis_dir, parse_gaussian94)
