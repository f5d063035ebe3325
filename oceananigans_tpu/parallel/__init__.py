from .distributed import Distributed, Partition
from .halo_exchange import halo_exchange_local, make_halo_exchange
from .pencil_fft import (DistributedFFTPoissonSolver,
                         DistributedFourierTridiagonalPoissonSolver)

__all__ = ["Distributed", "Partition", "halo_exchange_local",
           "make_halo_exchange", "DistributedFFTPoissonSolver",
           "DistributedFourierTridiagonalPoissonSolver"]
