"""TPU compute kernels: stage executors and two-float arithmetic."""

from .stages import (ConvExec, FracPolyExec, FracWholeExec, HBDownExec,
                     HBUpExec, build_exec)
