SELECT COUNT(*) FROM question as q
WHERE q.favorite_count >= 20
  AND q.creation_date >= '2010-07-01 00:00:00'::timestamp
  AND q.creation_date <= '2014-01-01 00:00:00'::timestamp;
