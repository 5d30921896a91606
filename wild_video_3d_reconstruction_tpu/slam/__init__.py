from .dpvo import DPVO
from .state import SLAMState, init_state
