from .config import Configuration, ConfigurationBuilder
from .selection import SelectionMode, SelectionVector
from .projector import (Filter, FilterProject, Projector, make_filter,
                        make_filter_project, make_projector)
from . import validator
