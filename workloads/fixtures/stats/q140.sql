SELECT COUNT(*) FROM posts as p, tags as t, postHistory as ph WHERE t.ExcerptPostId = p.Id AND ph.PostId = p.Id AND p.CommentCount>=1 AND p.FavoriteCount>=1;
