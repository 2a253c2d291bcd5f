from valle_tpu.codec.encodec_model import EncodecConfig, EncodecJax
from valle_tpu.codec.convert import convert_encodec_state_dict
