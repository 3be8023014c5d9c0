package graft.ext

import graft.core.Q

/** [EXT] operator registry — the training-data-pipeline surface
  * (dedup, similarity, text analysis, events/streaming, multimodal).
  * Modules register here as they come online.
  */
object Registry {
  def all: Seq[Q] =
    EventsOps.all ++ TypedSessionize.all ++ TextAnalysis.all ++ Dedup.all ++
      Corpus.all ++ Decontam.all ++ Redact.all ++ Similarity.all ++
      IvfSearch.all ++ PqSearch.all ++ Quantize.all ++
      Multimodal.all ++
      Profiling.all ++ InvertedIndex.all ++
      BucketedJoin.all ++ PartitionedScan.all ++ ZOrderLayout.all ++
      RangeLayout.all ++ FeatureGen.all ++ Survival.all ++ Clustering.all ++
      ModelEval.all ++
      BloomJoin.all ++ StoreFeed.all ++ ReplaceFeed.all ++ CloneFeed.all ++
      OptimizeFeed.all ++ CompactSmallFeed.all ++ DdlFeed.all ++
      Scd2.all ++ SqlFront.all ++ DvFeed.all ++ SqlDmlFeed.all ++
      IncrView.all ++
      IndexMaintain.all ++ StreamIngestFeed.all ++ StoreFollow.all ++
      Warehouse.all ++ Attribution.all ++ LangModel.all ++
      Skyline.all ++ Intervals.all ++ VecFuncs.all ++ Stats.all ++
      AsOfNative.all ++ Dsir.all ++
      AssocRules.all ++ Graph.all ++ KmvDistinct.all ++ TimeSeries.all ++
      ClickPaths.all ++ SkewAudit.all ++ Collocations.all ++
      PcaPower.all ++
      graft.sources.JsonlIngest.all ++ graft.sources.CsvIngest.all ++
      graft.streaming.EventsStream.all ++
      graft.streaming.StatefulSessions.all ++
      graft.streaming.StreamStateCensus.all ++
      graft.streaming.StreamDedup.all ++
      graft.streaming.StreamJoin.all ++
      graft.streaming.StreamFunnel.all ++
      graft.streaming.StreamAttribution.all ++
      graft.streaming.StreamEwma.all ++
      graft.streaming.StreamAnomaly.all ++
      graft.streaming.StreamKmv.all ++
      graft.streaming.StreamSessionWindow.all ++
      graft.streaming.StreamFeaturePit.all ++
      graft.streaming.StoreStreamFeed.all
}
