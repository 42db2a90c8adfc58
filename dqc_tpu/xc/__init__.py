from .base import BaseXC, HFExchangeXC  # noqa: F401
from .getxc import get_xc, get_libxc    # noqa: F401
from .custom import CustomXC            # noqa: F401
