from . import convert, extractor, layers, update, vonet
