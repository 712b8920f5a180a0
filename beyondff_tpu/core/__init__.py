"""Pure-function core: geometry, mask algebra, RLE codec, aggregation, filtering."""
