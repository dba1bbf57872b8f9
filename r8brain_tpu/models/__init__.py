"""Planner, executors, and public resampler front-ends."""

from .oracle import OracleResampler
from .plan import Plan, make_plan
from .resampler import Resampler, Resampler16, Resampler16IR, Resampler24
from .stream import StreamResampler
