from .distributed import CPU, GPU, Distributed, Partition
from .halo_exchange import halo_exchange_local, make_halo_exchange
from .pencil_fft import (DistributedFFTPoissonSolver,
                         DistributedFourierTridiagonalPoissonSolver)

__all__ = ["CPU", "GPU", "Distributed", "Partition", "halo_exchange_local",
           "make_halo_exchange", "DistributedFFTPoissonSolver",
           "DistributedFourierTridiagonalPoissonSolver"]
