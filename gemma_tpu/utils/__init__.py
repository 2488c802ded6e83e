from gemma_tpu.utils.log import RunLog, PhaseTimer
from gemma_tpu.utils.validate import validate_kinship
