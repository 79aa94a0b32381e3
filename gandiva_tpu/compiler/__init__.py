from .config import Configuration, ConfigurationBuilder
from .selection import SelectionMode, SelectionVector
from .projector import Filter, Projector, make_filter, make_projector
from . import validator
