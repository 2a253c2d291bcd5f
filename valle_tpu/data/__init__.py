from valle_tpu.data.audio_io import convert_audio, read_wav, resample, write_wav
from valle_tpu.data.bucketing import BucketSpec, DynamicBucketingSampler, SingleCutSampler
from valle_tpu.data.collation import TextTokenCollater, get_text_token_collater
from valle_tpu.data.dataset import Prefetcher, SpeechSynthesisDataset, TtsDataLoader
from valle_tpu.data.fbank import BigVGANFbank, get_fbank_extractor, mel_distance
from valle_tpu.data.input_strategies import NeighborPromptStrategy, PromptedFeatures
from valle_tpu.data.shards import CodeShardWriter, Manifest
from valle_tpu.data.symbol_table import SymbolTable
from valle_tpu.data.text_tokenizer import TextTokenizer, tokenize_text
from valle_tpu.data.vshard import VShardReader, VShardWriter
