package graft.sources

/** Google Analytics (UA v4) schema-by-convention metric tables, ported
  * verbatim from the reference so column typing matches exactly
  * (/root/reference/modules/aggregation/custom/google_analytics.py:32-286,
  * dispatch :513-540): `date` -> DATE, `view` + int table/regexes -> INT64,
  * float table/regexes -> FLOAT64, everything else STRING. Entries with a
  * literal XX placeholder are matched by the regex variants. */
object GaMetricTypes {

  val IntMetrics: Set[String] = Set(
    "users", "newUsers", "1dayUsers", "7dayUsers", "14dayUsers",
    "28dayUsers", "30dayUsers", "sessions", "bounces",
    "uniqueDimensionCombinations", "hits", "organicSearches", "impressions",
    "adClicks", "goalXXStarts", "goalStartsAll", "goalXXCompletions",
    "goalCompletionsAll", "goalXXAbandons", "goalAbandonsAll", "entrances",
    "pageviews", "uniquePageviews", "exits", "contentGroupUniqueViewsXX",
    "searchResultViews", "searchUniques", "searchSessions", "searchDepth",
    "searchRefinements", "searchExits", "pageLoadTime", "pageLoadSample",
    "domainLookupTime", "pageDownloadTime", "redirectionTime",
    "serverConnectionTime", "serverResponseTime", "speedMetricsSample",
    "domInteractiveTime", "domContentLoadedTime", "domLatencyMetricsSample",
    "screenviews", "uniqueScreenviews", "totalEvents", "uniqueEvents",
    "eventValue", "sessionsWithEvent", "transactions", "itemQuantity",
    "uniquePurchases", "internalPromotionClicks", "internalPromotionViews",
    "productAddsToCart", "productCheckouts", "productDetailViews",
    "productListClicks", "productListViews", "productRefunds",
    "productRemovesFromCart", "quantityAddedToCart", "quantityCheckedOut",
    "quantityRefunded", "quantityRemovedFromCart", "totalRefunds",
    "socialInteractions", "uniqueSocialInteractions", "userTimingValue",
    "userTimingSample", "exceptions", "fatalExceptions",
    "dcmFloodlightQuantity", "dcmClicks", "dcmImpressions",
    "adsenseAdUnitsViewed", "adsenseAdsViewed", "adsenseAdsClicks",
    "adsensePageImpressions", "adsenseExits", "totalPublisherImpressions",
    "totalPublisherMonetizedPageviews", "totalPublisherClicks",
    "backfillImpressions", "backfillMonetizedPageviews", "backfillClicks",
    "dfpImpressions", "dfpMonetizedPageviews", "dfpClicks",
    "cohortActiveUsers", "cohortTotalUsers",
    "cohortTotalUsersWithLifetimeCriteria", "dbmClicks", "dbmConversions",
    "dbmImpressions", "dsClicks", "dsImpressions")

  val FloatMetrics: Set[String] = Set(
    "percentNewSessions", "sessionsPerUser", "bounceRate", "sessionDuration",
    "avgSessionDuration", "adCost", "CPM", "CPC", "CTR",
    "costPerTransaction", "costPerGoalConversion", "costPerConversion",
    "RPC", "ROAS", "goalXXValue", "goalValueAll", "goalValuePerSession",
    "goalXXConversionRate", "goalConversionRateAll", "goalXXAbandonRate",
    "goalAbandonRateAll", "pageValue", "entranceRate", "pageviewsPerSession",
    "timeOnPage", "avgTimeOnPage", "exitRate", "avgSearchResultViews",
    "percentSessionsWithSearch", "avgSearchDepth",
    "percentSearchRefinements", "searchDuration", "avgSearchDuration",
    "searchExitRate", "searchGoalXXConversionRate",
    "searchGoalConversionRateAll", "goalValueAllPerSearch",
    "avgPageLoadTime", "avgDomainLookupTime", "avgPageDownloadTime",
    "avgRedirectionTime", "avgServerConnectionTime", "avgServerResponseTime",
    "avgDomInteractiveTime", "avgDomContentLoadedTime",
    "screenviewsPerSession", "timeOnScreen", "avgScreenviewDuration",
    "avgEventValue", "eventsPerSessionWithEvent", "transactionsPerSession",
    "transactionRevenue", "revenuePerTransaction",
    "transactionRevenuePerSession", "transactionShipping", "transactionTax",
    "totalValue", "revenuePerItem", "itemRevenue", "itemsPerPurchase",
    "localTransactionRevenue", "localTransactionShipping",
    "localTransactionTax", "localItemRevenue", "buyToDetailRate",
    "cartToDetailRate", "internalPromotionCTR", "localProductRefundAmount",
    "localRefundAmount", "productListCTR", "productRefundAmount",
    "productRevenuePerPurchase", "refundAmount", "revenuePerUser",
    "transactionsPerUser", "socialInteractionsPerSession",
    "avgUserTimingValue", "exceptionsPerScreenview",
    "fatalExceptionsPerScreenview", "metricXX", "dcmFloodlightRevenue",
    "dcmCPC", "dcmCTR", "dcmCost", "dcmROAS", "dcmRPC", "adsenseRevenue",
    "adsenseCTR", "adsenseECPM", "adsenseViewableImpressionPercent",
    "adsenseCoverage", "totalPublisherCoverage",
    "totalPublisherImpressionsPerSession",
    "totalPublisherViewableImpressionsPercent", "totalPublisherCTR",
    "totalPublisherRevenue", "totalPublisherRevenuePer1000Sessions",
    "totalPublisherECPM", "backfillCoverage",
    "backfillImpressionsPerSession", "backfillViewableImpressionsPercent",
    "backfillCTR", "backfillRevenue", "backfillRevenuePer1000Sessions",
    "backfillECPM", "dfpCoverage", "dfpImpressionsPerSession",
    "dfpViewableImpressionsPercent", "dfpCTR", "dfpRevenue",
    "dfpRevenuePer1000Sessions", "dfpECPM", "cohortAppviewsPerUser",
    "cohortAppviewsPerUserWithLifetimeCriteria",
    "cohortGoalCompletionsPerUser",
    "cohortGoalCompletionsPerUserWithLifetimeCriteria",
    "cohortPageviewsPerUser", "cohortPageviewsPerUserWithLifetimeCriteria",
    "cohortRetentionRate", "cohortRevenuePerUser",
    "cohortRevenuePerUserWithLifetimeCriteria",
    "cohortSessionDurationPerUser",
    "cohortSessionDurationPerUserWithLifetimeCriteria",
    "cohortSessionsPerUser", "cohortSessionsPerUserWithLifetimeCriteria",
    "dbmCPA", "dbmCPC", "dbmCPM", "dbmCTR", "dbmCost", "dbmROAS", "dsCPC",
    "dsCTR", "dsCost", "dsProfit", "dsReturnOnAdSpend", "dsRevenuePerClick")

  val IntMetricRegexes: Seq[String] = Seq(
    "^goal\\w*Starts", "^goal\\w*Completions", "^goal\\w*Abandons",
    "^contentGroupUniqueViews\\w*$")

  val FloatMetricRegexes: Seq[String] = Seq(
    "^goal\\w*Starts$", "^goal\\w*Value$", "^goal\\w*ConversionRate$",
    "^goal\\w*AbandonRate$", "^searchGoal\\w*ConversionRate$",
    "^metric\\w*$", "^calcMetric_\\w*$")

  /** The reference's _get_type_for_field dispatch (google_analytics.py:513-525). */
  def sparkTypeFor(column: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    // python re.match anchors at the start only — lookingAt, not matches
    def reMatch(r: String) =
      java.util.regex.Pattern.compile(r).matcher(column).lookingAt()
    if (column == "date") DateType
    else if (column == "view" || IntMetrics.contains(column) ||
      IntMetricRegexes.exists(reMatch))
      LongType // INT64 (unsigned widening documented in SURVEY §1.2)
    else if (FloatMetrics.contains(column) || FloatMetricRegexes.exists(reMatch))
      DoubleType
    else StringType
  }
}
