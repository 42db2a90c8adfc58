from .loader import loadbasis, list_basis_sets  # noqa: F401
