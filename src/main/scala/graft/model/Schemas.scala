package graft.model

import java.sql.{Date, Timestamp}

/** Typed rows for the Netflix-format star schema (reference:
  * `/root/reference/schema.sql:28-111`), used with case-class Encoders
  * where the ingestion path benefits from compile-time field checks.
  */
object Schemas {

  /** Parsed `movie_titles.csv` row (schema.sql:53-67). */
  final case class Movie(movie_id: Int, release_year: Option[Short], title: String)

  /** Parsed `combined_data_N.txt` detail row after fill-forward
    * (etl_pipeline_spark.py:1125-1137). */
  final case class RatingRaw(movie_id: Int, customer_id: Int, rating: Short,
                             rating_date: Date)

  /** fact_ratings output row (schema.sql:95-111, surrogate keys). */
  final case class FactRating(customer_key: Int, movie_key: Int, date_key: Int,
                              rating: Short, rating_timestamp: Timestamp)
}
