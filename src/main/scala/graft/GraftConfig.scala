package graft

/** Engine configuration mirroring the reference's env-sourced config
  * (`config/config.go:18-47`) and its validation rules
  * (`config/validation.go:9-56`), restricted to the knobs that exist in
  * the Spark re-expression. Secrets are redacted from `toString` like the
  * reference's `String()` (`config/config_test.go:101-105`).
  */
final case class GraftConfig(
    batchSize: Int = 1,               // BATCH_SIZE (reference default 1)
    enablePatchNodeId: Boolean = true, // ENABLE_PATCH_NODE_ID
    datasetApiBatchSize: Int = 1000,  // DATASET_API_BATCH_SIZE
    datasetApiMaxWorkers: Int = 100,  // DATASET_API_MAX_WORKERS
    shufflePartitions: Int = 32,
    serviceAuthToken: String = "") {

  def validate(): Either[String, GraftConfig] =
    if (batchSize < 1) Left("BATCH_SIZE must be at least 1")
    else if (datasetApiBatchSize < 1) Left("DATASET_API_BATCH_SIZE must be at least 1")
    else if (datasetApiMaxWorkers < 1) Left("DATASET_API_MAX_WORKERS must be at least 1")
    else if (shufflePartitions < 1) Left("shufflePartitions must be at least 1")
    else Right(this)

  override def toString: String =
    s"GraftConfig(batchSize=$batchSize, enablePatchNodeId=$enablePatchNodeId, " +
      s"datasetApiBatchSize=$datasetApiBatchSize, datasetApiMaxWorkers=$datasetApiMaxWorkers, " +
      s"shufflePartitions=$shufflePartitions, serviceAuthToken=<redacted>)"
}

object GraftConfig {

  /** Env-driven load with reference defaults; malformed ints are a
    * validation error, not an exception.
    */
  def fromEnv(env: Map[String, String] = sys.env): Either[String, GraftConfig] = {
    def int(key: String, dflt: Int): Either[String, Int] =
      env.get(key) match {
        case None => Right(dflt)
        case Some(v) => v.toIntOption.toRight(s"$key must be an integer, got '$v'")
      }
    for {
      bs <- int("BATCH_SIZE", 1)
      dabs <- int("DATASET_API_BATCH_SIZE", 1000)
      damw <- int("DATASET_API_MAX_WORKERS", 100)
      sp <- int("GRAFT_SHUFFLE_PARTITIONS", 32)
      cfg <- GraftConfig(
        batchSize = bs,
        enablePatchNodeId = env.get("ENABLE_PATCH_NODE_ID").forall(_ != "false"),
        datasetApiBatchSize = dabs,
        datasetApiMaxWorkers = damw,
        shufflePartitions = sp,
        serviceAuthToken = env.getOrElse("SERVICE_AUTH_TOKEN", "")).validate()
    } yield cfg
  }
}
