SELECT COUNT(*) FROM site as s, question as q, answer as a, so_user as u
WHERE q.site_id = s.site_id AND a.site_id = s.site_id AND a.question_id = q.id
  AND a.owner_user_id = u.id AND u.site_id = s.site_id
  AND s.site_name IN ('math','superuser') AND u.reputation >= 100 AND a.score >= 2;
