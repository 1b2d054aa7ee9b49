from slam_plus_plus_tpu.assembly.assembler import Assembler, BlockSystem

__all__ = ["Assembler", "BlockSystem"]
